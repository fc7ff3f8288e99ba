from . import image_fit
