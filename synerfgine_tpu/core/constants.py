"""Numeric constants of the NGP/SyNeRFgine pipeline.

Values mirror the reference contract (SURVEY.md Appendix B):
reference `include/neural-graphics-primitives/nerf_device.cuh:25-43`,
`nerf_loader.h:29`, `testbed.h:302,815,867`.
"""
import math

# Occupancy ("density") grid: 128^3 voxels per cascade, up to 8 cascades.
NERF_GRIDSIZE = 128
NERF_CASCADES = 8

# Max march steps per ray during training; base step = cube diagonal / steps.
NERF_STEPS = 1024
SQRT3 = math.sqrt(3.0)
STEPSIZE = SQRT3 / NERF_STEPS  # ~0.001692

# Largest cone stepsize — bounded so a step never skips a whole grid voxel
# at the coarsest cascade (nerf_device.cuh:36):
#   STEPSIZE * 2^(NERF_CASCADES-1) * NERF_STEPS / NERF_GRIDSIZE = sqrt(3).
# With cone_angle > 0 this is the ceiling of the exponential-stepping
# regime; the old (round-1) value of STEPSIZE collapsed exponential
# stepping entirely, so 1024 uniform min-steps covered only ~1.7 world
# units of a big-aabb scene and far geometry was never sampled.
MAX_CONE_STEPSIZE = (
    STEPSIZE * (1 << (NERF_CASCADES - 1)) * NERF_STEPS / NERF_GRIDSIZE
)


def max_cone_stepsize() -> float:
    return MAX_CONE_STEPSIZE


# Minimum optical thickness a voxel must reach to stay "occupied"
# (density threshold = value / min-stepsize).
MIN_OPTICAL_THICKNESS = 0.01

# Dataset world->NGP scale (nerf_loader.h:29): NeRF-synthetic scenes are
# shrunk by 1/3 and centered at 0.5 so the object fits the unit cube.
NERF_SCALE = 0.33

# Training defaults (testbed.h:1103,509; testbed_nerf.cu:3534)
DEFAULT_BATCH_SIZE = 1 << 18
INITIAL_RAYS_PER_BATCH = 1 << 12
MAX_SAMPLES_FACTOR = 16  # max samples buffer = 16 x batch

# fp16 loss scale in the reference (testbed.h:302). With bf16 compute and
# fp32 master params we do not need loss scaling; kept for snapshot parity.
DEFAULT_LOSS_SCALE = 128.0

# Early-termination transmittance epsilons.
TRAIN_T_EPS = 1e-4          # testbed_nerf.cu:1058
RENDER_MIN_TRANSMITTANCE = 0.01   # testbed.h:867 (interactive default)
EVAL_MIN_TRANSMITTANCE = 1e-4     # run.py:231 (PSNR protocol)

# Density-grid EMA decay (testbed.h:815)
DENSITY_GRID_DECAY = 0.95

# Huber loss alpha (nerf_device.cuh:612); the reference divides the huber
# loss by 5 to keep its magnitude comparable with L2 for PSNR estimation.
HUBER_ALPHA = 0.1

# RNG seeds (synerfgine/common.cuh:20, testbed.h:691)
PT_SEED = 1999
TESTBED_SEED = 1337
