"""3D Morton (Z-order) codes, vectorized in jnp.

The occupancy grid is Morton-indexed exactly like the reference
(nerf_device.cuh:317-339) so that the 8 children of a coarse voxel are
contiguous — this makes the bitfield max-pool a reshape+max instead of a
gather. Bit-interleave uses the standard magic-number spread for 10-bit
coordinates (grid size 128 needs 7 bits).
"""
import jax.numpy as jnp


def _part1by2(x: jnp.ndarray) -> jnp.ndarray:
    """Spread the low 10 bits of x so there are 2 zero bits between each."""
    x = x.astype(jnp.uint32) & 0x3FF
    x = (x | (x << 16)) & jnp.uint32(0x30000FF)
    x = (x | (x << 8)) & jnp.uint32(0x300F00F)
    x = (x | (x << 4)) & jnp.uint32(0x30C30C3)
    x = (x | (x << 2)) & jnp.uint32(0x9249249)
    return x


def _compact1by2(x: jnp.ndarray) -> jnp.ndarray:
    x = x.astype(jnp.uint32) & jnp.uint32(0x9249249)
    x = (x ^ (x >> 2)) & jnp.uint32(0x30C30C3)
    x = (x ^ (x >> 4)) & jnp.uint32(0x300F00F)
    x = (x ^ (x >> 8)) & jnp.uint32(0x30000FF)
    x = (x ^ (x >> 16)) & jnp.uint32(0x3FF)
    return x


def morton3(x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray) -> jnp.ndarray:
    """Encode integer coords -> morton code. Matches morton3D of the reference
    contract: x in lowest interleave slot."""
    return _part1by2(x) | (_part1by2(y) << 1) | (_part1by2(z) << 2)


def inv_morton3(code: jnp.ndarray):
    """Decode morton code -> (x, y, z) integer coords."""
    c = code.astype(jnp.uint32)
    return _compact1by2(c), _compact1by2(c >> 1), _compact1by2(c >> 2)
