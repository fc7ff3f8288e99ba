from .exr import read_exr
from .image import read_image, write_image, srgb_to_linear, linear_to_srgb
