from .constants import (
    NERF_GRIDSIZE,
    NERF_CASCADES,
    NERF_STEPS,
    STEPSIZE,
    NERF_SCALE,
    MIN_OPTICAL_THICKNESS,
)
from .types import Ray, BoundingBox, RayBundle
from . import camera, morton, config
