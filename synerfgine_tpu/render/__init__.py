from .tonemap import tonemap, TONEMAP_CURVES
from .camera_path import CameraPath, SngCamPath
