"""Pallas TPU kernel: fused bias-free MLP chain.

The tiny NGP MLPs (64-wide, 1-2 hidden layers) are individually too small
to saturate the MXU when launched as separate XLA matmuls with
inter-layer HBM round trips. This kernel fuses the whole chain over a
tile of samples: weights live in VMEM for the entire grid sweep, hidden
activations never leave VMEM — the TPU analogue of tiny-cuda-nn's
FullyFusedMLP (whose whole point is keeping activations in
registers/shared memory).

Used opportunistically by `fused_mlp_apply` when shapes are MXU-friendly;
the jnp path (nn/mlp.py) remains the reference implementation and
autodiff path (this kernel is forward-only; training wraps it with the
standard custom-vjp pattern in a later round).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _kernel(x_ref, *refs):
    """refs = w_0..w_{L-1}, out_ref. ReLU between layers, linear output."""
    *w_refs, out_ref = refs
    h = x_ref[...]
    n = len(w_refs)
    for i, w_ref in enumerate(w_refs):
        h = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    out_ref[...] = h


def fused_mlp_forward(x: jnp.ndarray, weights, interpret: bool = False
                      ) -> jnp.ndarray:
    """x: (N, d_in) bf16/fp32; weights: list of (d_i, d_{i+1}).
    N must be a multiple of TILE (caller pads). Returns fp32 (N, d_out)."""
    n = x.shape[0]
    assert n % TILE == 0, "pad N to a multiple of TILE"
    d_out = weights[-1].shape[1]
    grid = (n // TILE,)
    in_specs = [pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                             memory_space=pltpu.ANY if interpret else pltpu.VMEM)]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=pltpu.ANY if interpret else pltpu.VMEM))
    return pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((n, d_out), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=pltpu.ANY if interpret else pltpu.VMEM),
        interpret=interpret,
    )(x, *weights)


def fused_mlp_apply(mlp, params, x, compute_dtype=jnp.bfloat16,
                    interpret: bool = False):
    """Drop-in for `MLP.__call__` (forward only): pads N to TILE, casts to
    the compute dtype, runs the fused kernel."""
    n = x.shape[0]
    pad = (-n) % TILE
    xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)]) if pad else x
    out = fused_mlp_forward(
        xp.astype(compute_dtype),
        [w.astype(compute_dtype) for w in params],
        interpret=interpret,
    )
    out = out[:n]
    return mlp.output_activation(out)
