from . import image_fit, nerf_trainer
from .nerf_trainer import NerfTrainer, NerfTrainState, scene_aabb
