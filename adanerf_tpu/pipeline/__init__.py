from .keys import DatasetKeys, FSK
