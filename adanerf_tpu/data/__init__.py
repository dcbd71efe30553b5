from .dataset import DatasetInfo, ViewCellDataset, load_dataset_split
from .sampling import RSequence, UniformSequence, get_sequence_generator
