from .metrics import mse, psnr
from .flip import flip_error_map, flip_value
from .iw_ssim import iw_ssim
from .evaluate import evaluate, QualityContainer
