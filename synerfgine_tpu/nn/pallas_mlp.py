"""Pallas TPU kernel: fused bias-free MLP chain (fwd + custom-VJP bwd).

The tiny NGP MLPs (64-wide, 1-2 hidden layers) are individually too small
to saturate the MXU when launched as separate XLA matmuls with
inter-layer HBM round trips. These kernels fuse the whole chain over a
tile of samples: weights live in VMEM for the entire grid sweep, hidden
activations never leave VMEM — the TPU analogue of tiny-cuda-nn's
FullyFusedMLP (whose whole point is keeping activations in
registers/shared memory).

The backward kernel recomputes the (VMEM-cheap) activations per tile and
accumulates weight gradients across the sequential TPU grid (output
blocks pinned to (0, 0) are revisited and act as accumulators). ReLU
hidden activations are assumed (all reference configs use ReLU).

Enabled behind `NerfNetwork(use_pallas_mlp=True)`; the jnp path
(nn/mlp.py) remains the reference implementation. On non-TPU backends
the kernels run in interpret mode automatically (tests).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256


def _auto_interpret(interpret):
    if interpret is None:
        return jax.default_backend() != "tpu"
    return interpret


def _space(interpret):
    return pltpu.ANY if interpret else pltpu.VMEM


def _fwd_kernel(x_ref, *refs):
    """refs = w_0..w_{L-1}, out_ref. ReLU between layers, linear output."""
    *w_refs, out_ref = refs
    h = x_ref[...]
    n = len(w_refs)
    for i, w_ref in enumerate(w_refs):
        h = jnp.dot(h, w_ref[...], preferred_element_type=jnp.float32)
        if i < n - 1:
            h = jnp.maximum(h, 0.0).astype(x_ref.dtype)
    out_ref[...] = h


def fused_mlp_forward(x: jnp.ndarray, weights, interpret: bool | None = None
                      ) -> jnp.ndarray:
    """x: (N, d_in) bf16/fp32; weights: list of (d_i, d_{i+1}).
    N must be a multiple of TILE (caller pads). Returns fp32 (N, d_out)."""
    interpret = _auto_interpret(interpret)
    n = x.shape[0]
    assert n % TILE == 0, "pad N to a multiple of TILE"
    d_out = weights[-1].shape[1]
    grid = (n // TILE,)
    in_specs = [pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                             memory_space=_space(interpret))]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=_space(interpret)))
    return pl.pallas_call(
        _fwd_kernel,
        out_shape=jax.ShapeDtypeStruct((n, d_out), jnp.float32),
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, d_out), lambda i: (i, 0),
                               memory_space=_space(interpret)),
        interpret=interpret,
    )(x, *weights)


def _bwd_kernel(x_ref, g_ref, *refs):
    """refs = w_0..w_{L-1}, dx_ref, dw_0..dw_{L-1}.

    Recomputes activations for this tile, then backprops. Weight-grad
    outputs are pinned to block (0,0): the sequential TPU grid revisits
    them, so `+=` accumulates across tiles."""
    L = (len(refs) - 1) // 2
    ws = refs[:L]
    dx_ref = refs[L]
    dws = refs[L + 1:]

    @pl.when(pl.program_id(0) == 0)
    def _init():
        for dw in dws:
            dw[...] = jnp.zeros_like(dw)

    h = [x_ref[...]]
    for l in range(L - 1):
        a = jnp.dot(h[-1], ws[l][...], preferred_element_type=jnp.float32)
        h.append(jnp.maximum(a, 0.0).astype(x_ref.dtype))

    grad = g_ref[...]                                   # (T, d_out) fp32
    for l in reversed(range(L)):
        gl = grad.astype(x_ref.dtype)
        dws[l][...] += jax.lax.dot_general(
            h[l], gl, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)         # h^T @ grad
        grad = jax.lax.dot_general(
            gl, ws[l][...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)         # grad @ w^T
        if l > 0:
            grad = grad * (h[l] > 0)
    dx_ref[...] = grad


def fused_mlp_backward(x, g, weights, interpret: bool | None = None):
    interpret = _auto_interpret(interpret)
    n = x.shape[0]
    grid = (n // TILE,)
    in_specs = [
        pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                     memory_space=_space(interpret)),
        pl.BlockSpec((TILE, g.shape[1]), lambda i: (i, 0),
                     memory_space=_space(interpret)),
    ]
    for w in weights:
        in_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                     memory_space=_space(interpret)))
    out_shape = [jax.ShapeDtypeStruct((n, x.shape[1]), jnp.float32)]
    out_specs = [pl.BlockSpec((TILE, x.shape[1]), lambda i: (i, 0),
                              memory_space=_space(interpret))]
    for w in weights:
        out_shape.append(jax.ShapeDtypeStruct(w.shape, jnp.float32))
        out_specs.append(pl.BlockSpec(w.shape, lambda i: (0, 0),
                                      memory_space=_space(interpret)))
    outs = pl.pallas_call(
        _bwd_kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        interpret=interpret,
    )(x, g, *weights)
    return outs[0], list(outs[1:])


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _fused_chain(interpret, x, weights):
    return fused_mlp_forward(x, weights, interpret)


def _fused_chain_fwd(interpret, x, weights):
    return fused_mlp_forward(x, weights, interpret), (x, weights)


def _fused_chain_bwd(interpret, res, g):
    x, weights = res
    dx, dws = fused_mlp_backward(x, g, weights, interpret)
    return dx.astype(x.dtype), [dw.astype(w.dtype)
                                for dw, w in zip(dws, weights)]


_fused_chain.defvjp(_fused_chain_fwd, _fused_chain_bwd)


def fused_mlp_apply(mlp, params, x, compute_dtype=jnp.bfloat16,
                    interpret: bool | None = None):
    """Drop-in for `MLP.__call__`: pads N to TILE, casts to the compute
    dtype, runs the fused kernel. Differentiable (custom VJP); gradients
    flow back to the fp32 master weights through the dtype casts."""
    import jax.nn as jnn

    assert mlp.activation is jnn.relu, "fused kernel assumes ReLU hidden"
    n = x.shape[0]
    pad = (-n) % TILE
    xp = jnp.concatenate([x, jnp.zeros((pad, x.shape[1]), x.dtype)]) if pad else x
    out = _fused_chain(
        _auto_interpret(interpret),
        xp.astype(compute_dtype),
        [w.astype(compute_dtype) for w in params],
    )
    out = out[:n]
    return mlp.output_activation(out)
