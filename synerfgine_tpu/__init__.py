"""synerfgine_tpu — a TPU-native hybrid NeRF + synthetic-object rendering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
CUDA codebase (trxe/SyNeRFgine = instant-ngp + a hybrid path-traced object
layer).  Not a port: all hot paths are jitted XLA programs or Pallas TPU
kernels; device-parallel scale comes from `jax.sharding` meshes rather than
CUDA streams/peer copies.

Subpackages
-----------
core      : math types, camera models, config system, morton codes
nn        : hash-grid & SH encodings, MLPs, composite NeRF network,
            losses, optimizer stack (Adam/ExponentialDecay/EMA)
grid      : cascaded occupancy (density) grid lifecycle
march     : ray marching — DDA stepping, training sampler, renderer
geometry  : triangles, BVH build/traversal, OBJ loading
hybrid    : synthetic path tracer, materials, lights, engine compositor
data      : dataset loaders (NeRF transforms.json, image, SDF)
train     : training loops and state
render    : render buffers, tonemapping, camera paths
dist      : device mesh + sharding helpers
io        : snapshot (checkpoint) save/load, EXR/PNG IO
eval      : PSNR/SSIM metrics and eval harness
"""

__version__ = "0.1.0"
