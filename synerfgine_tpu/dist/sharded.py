"""Data-parallel sharded NeRF training over a device mesh.

The distributed-training layer the reference lacks (SURVEY.md §2.4 row
"Data parallel (multi-device training): NO"): rays are sharded over the
`data` mesh axis, parameters/optimizer state/occupancy grid are
replicated, and gradients are `psum`ed over ICI inside `shard_map` so XLA
can overlap the all-reduce with the backward pass.

The distributed step IS the measured fast path: `ShardedNerfTrainer`
re-jits the wrapped trainer's own `_train_step` / `_train_scan` /
`_grid_update_fn` bodies inside `shard_map` (the trainer is constructed
SPMD-aware via `spmd_axis`/`n_shards`), so scan fusion, adaptive rays,
the grid-update cadence, error-map deposits, camera/exposure optimization
and envmap training all run identically on 1 chip and N chips — the only
differences are the per-shard ray slice and the collective reductions
(`pmean` grads/loss, `psum` counters/error-map deltas, `pmax` grid
splats) inserted by the trainer when `spmd_axis` is set.

Per-shard RNG: each device folds `axis_index` into the step key, so
shards sample disjoint ray batches — the global batch is exactly the
single-device batch (n_rays and batch_size are GLOBAL sizes, divided
across shards inside the step).
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.nerf_trainer import NerfTrainer, NerfTrainState
from .mesh import data_axis


class ShardedNerfTrainer:
    """Runs a NerfTrainer's full fast path under shard_map.

    Takes ownership of `trainer`: its jitted entry points are replaced
    with shard_map'ed versions and its SPMD fields are set, after which
    `trainer.train(...)` / `trainer.step(...)` themselves execute the
    distributed program (this wrapper's train/step delegate to them).
    """

    def __init__(self, trainer: NerfTrainer, mesh: Mesh):
        self.trainer = trainer
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        if (trainer.n_rays % self.n_shards
                or trainer.batch_size % (8 * self.n_shards)):
            raise ValueError(
                "n_rays must divide mesh size and batch_size must divide "
                "8 * mesh size (segment compaction granularity)")
        # make the trainer's step bodies emit the collective reductions
        trainer.spmd_axis = data_axis
        trainer.n_shards = self.n_shards

        rep = P()
        self._replicated = NamedSharding(mesh, rep)
        tr = trainer

        def smap(fn, n_in, n_out):
            return shard_map(fn, mesh=mesh, in_specs=(rep,) * n_in,
                             out_specs=(rep,) * n_out if n_out > 1 else rep,
                             check_vma=False)

        def sharded_step(state, n_rays, data, n_active=None):
            body = smap(
                lambda s, d, a: tr._train_step(s, n_rays, d, a), 3, 3)
            return body(state, data, n_active)

        def sharded_grid(state, full_sweep):
            body = smap(lambda s: tr._grid_update_fn(s, full_sweep), 1, 1)
            return body(state)

        def sharded_scan(state, data, n_steps, warmup, n_rays,
                         n_active=None):
            # n_active is the GLOBAL exact ray count (a traced scalar,
            # replicated); _train_step divides it per shard alongside
            # the n_rays bucket
            body = smap(
                lambda s, d, a: tr._train_scan(s, d, n_steps, warmup,
                                               n_rays, a),
                3, 3)
            return body(state, data, n_active)

        # replace the trainer's jitted entries so its own host loop
        # (train(), step(), adaptive rays, cadence) drives the mesh
        tr._step = jax.jit(sharded_step, donate_argnums=(0,),
                           static_argnums=(1,))
        tr._grid_update = jax.jit(sharded_grid, donate_argnums=(0,),
                                  static_argnums=(1,))
        tr._scan_steps = jax.jit(sharded_scan, donate_argnums=(0,),
                                 static_argnums=(2, 3, 4))

    def init(self, key: jax.Array, mark_untrained: bool = True) -> NerfTrainState:
        state = self.trainer.init(key, mark_untrained)
        return jax.device_put(state, self._replicated)

    def step(self, state: NerfTrainState):
        """One training step incl. the trainer's grid-update cadence."""
        return self.trainer.step(state)

    def train(self, state: NerfTrainState, n_steps: int, **kw):
        """The scan-fused block loop — identical host code to the
        single-device fast path (NerfTrainer.train)."""
        return self.trainer.train(state, n_steps, **kw)
