"""Device-mesh construction and sharding conventions.

The reference has NO collective-communication layer (SURVEY.md §2.4): its
multi-GPU story is peer-to-peer parameter copies for rendering only
(testbed.cu:5045-5132). The TPU framework makes distributed training
first-class instead:

- mesh axes: `("data",)` — rays are embarrassingly parallel, the model is
  small (~12 M params, replicated). Tensor/pipeline axes are deliberately
  not used: at 64-wide MLPs and a 48 MB hash table, TP would trade a
  sub-millisecond matmul for per-layer all-gathers over ICI; documented
  here as a design decision rather than a missing feature.
- gradients: `psum` over "data" inside shard_map — XLA overlaps the
  all-reduce with the backward pass (latency-hiding scheduler).
- multi-host: the same code runs under `jax.distributed.initialize()`;
  the mesh spans all processes' devices.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

data_axis = "data"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (data_axis,))


def replicated() -> P:
    return P()


def data_sharded() -> P:
    return P(data_axis)
