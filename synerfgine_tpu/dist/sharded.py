"""Data-parallel sharded NeRF training over a device mesh.

The distributed-training layer the reference lacks (SURVEY.md §2.4 row
"Data parallel (multi-device training): NO"): rays are sharded over the
`data` mesh axis, parameters/optimizer state/occupancy grid are
replicated, and gradients are `psum`ed over ICI inside `shard_map` so XLA
can overlap the all-reduce with the backward pass.

Per-shard RNG: each device derives its own key with `fold_in(axis_index)`,
so shards sample disjoint ray batches — the global batch is
n_devices * n_rays_per_shard rays.
"""
from __future__ import annotations

from functools import partial

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..train.nerf_trainer import NerfTrainer, NerfTrainState
from .mesh import data_axis


class ShardedNerfTrainer:
    """Wraps a NerfTrainer with a mesh-parallel train step.

    The wrapped trainer's `loss_and_grads` runs per-shard with
    n_rays/batch_size divided by the mesh size; loss and grads are
    averaged with `psum` and the (replicated) optimizer update is applied
    identically on every device.
    """

    def __init__(self, trainer: NerfTrainer, mesh: Mesh):
        self.trainer = trainer
        self.mesh = mesh
        self.n_shards = mesh.devices.size
        assert trainer.n_rays % self.n_shards == 0, "n_rays % mesh size != 0"
        self._rays_per_shard = trainer.n_rays // self.n_shards
        self._batch_per_shard = trainer.batch_size // self.n_shards

        replicated = NamedSharding(mesh, P())

        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_rep=False,
        )
        def sharded_core(state: NerfTrainState, data, key):
            shard_key = jax.random.fold_in(key, jax.lax.axis_index(data_axis))
            loss, grads, n_samples, _aux = trainer.loss_and_grads(
                state.params,
                state.grid.bitfield,
                shard_key,
                n_rays=self._rays_per_shard,
                batch_size=self._batch_per_shard,
                data=data,
            )
            loss = jax.lax.pmean(loss, data_axis)
            grads = jax.lax.pmean(grads, data_axis)
            n_samples = jax.lax.psum(n_samples, data_axis)
            params, opt_state = trainer.opt.update(
                grads, state.opt_state, state.params
            )
            return (
                NerfTrainState(params, opt_state, state.grid, state.key),
                loss,
                n_samples,
            )

        @partial(jax.jit, donate_argnums=(0,))
        def step(state: NerfTrainState, data):
            key, k_step = jax.random.split(state.key)
            new_state, loss, n_samples = sharded_core(
                state._replace(key=key), data, k_step
            )
            return new_state._replace(key=key), loss, n_samples

        self._step = step
        self._replicated = replicated

    def init(self, key: jax.Array, mark_untrained: bool = True) -> NerfTrainState:
        state = self.trainer.init(key, mark_untrained)
        return jax.device_put(state, self._replicated)

    def step(self, state: NerfTrainState):
        """One training step incl. the trainer's grid-update cadence
        (grid update runs replicated — it is cheap relative to training)."""
        tr = self.trainer
        if tr.use_grid:
            s = tr.host_step
            if s < tr.grid_warmup_steps or s % tr.grid_update_cadence == 0:
                state = tr._grid_update(state, s < tr.grid_warmup_steps)
        state, loss, _ = self._step(state, tr.data)
        tr.host_step += 1
        return state, loss
