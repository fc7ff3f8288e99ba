"""Snapshot save/load — the framework's checkpoint/resume unit.

Capability match for `save_snapshot`/`load_snapshot`
(src/testbed.cu:4812-5015): a single compressed file holding the network
config, all parameters, optional optimizer state, the density grid stored
as fp16, the training step, and dataset metadata. Format: msgpack + zlib
(the reference uses msgpack+zlib for `.ingp`), with numpy arrays encoded
as {dtype, shape, data} maps. A `format_version` gate mirrors
SNAPSHOT_FORMAT_VERSION (testbed.cu:4880).
"""
from __future__ import annotations

import zlib
from typing import Any

import msgpack
import numpy as np

FORMAT_VERSION = 1
# Version of the hash-table indexing function the stored tables were
# trained under. 1 = tcnn-style all-XOR hash; 2 = x-additive aligned-pair
# hash (nn/hash_encoding.py _PRIMES comment). Tables trained under a
# different hash resume without error but gather the wrong rows, so load
# refuses on mismatch. This also documents that .ingp interchange with
# reference/tcnn-trained tables is NOT bit-compatible (hash version 1).
HASH_VERSION = 2
MAGIC = "synerfgine-tpu-snapshot"


def _pack_array(a) -> dict:
    a = np.asarray(a)
    return {"__nd__": True, "dtype": a.dtype.str, "shape": list(a.shape),
            "data": a.tobytes()}


def _unpack_array(d: dict) -> np.ndarray:
    return np.frombuffer(d["data"], np.dtype(d["dtype"])).reshape(d["shape"]).copy()


def _encode(obj):
    if isinstance(obj, (np.ndarray, np.generic)):
        return _pack_array(obj)
    if hasattr(obj, "dtype") and hasattr(obj, "shape"):  # jax array
        return _pack_array(np.asarray(obj))
    if isinstance(obj, dict):
        return {k: _encode(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_encode(v) for v in obj]
    return obj


def _decode(obj):
    if isinstance(obj, dict):
        if obj.get("__nd__"):
            return _unpack_array(obj)
        return {k: _decode(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_decode(v) for v in obj]
    return obj


def save_snapshot(
    path: str,
    params,
    opt_state=None,
    grid_state=None,
    step: int = 0,
    config: dict | None = None,
    dataset_meta: dict | None = None,
    include_optimizer: bool = False,
    compress: bool = True,
    hash_version: int = HASH_VERSION,
    adaptive_rays: int | None = None,
):
    """params/opt_state/grid_state are pytrees of arrays (NamedTuples ok).
    hash_version 1 marks tables indexed with the tcnn XOR hash
    (HashEncoding hash_mode=\"xor\" — e.g. imported .ingp snapshots)."""
    import jax

    payload: dict[str, Any] = {
        "magic": MAGIC,
        "format_version": FORMAT_VERSION,
        "hash_version": hash_version,
        "step": int(step),
        "config": config or {},
        "dataset_meta": dataset_meta or {},
    }
    if adaptive_rays is not None:
        # the adaptive ray count (testbed_nerf.cu n_rays state): resuming
        # without it re-converges from the default over the first blocks
        payload["adaptive_rays"] = int(adaptive_rays)
    leaves, treedef = jax.tree.flatten(params)
    payload["params"] = [_pack_array(l) for l in leaves]
    if include_optimizer and opt_state is not None:
        oleaves, _ = jax.tree.flatten(opt_state)
        payload["opt_state"] = [_pack_array(l) for l in oleaves]
    if grid_state is not None:
        # density grid as fp16, like the reference (testbed.cu:4869)
        payload["density_grid"] = _pack_array(
            np.asarray(grid_state.density).astype(np.float16)
        )
        payload["grid_ema_step"] = int(grid_state.ema_step)
    raw = msgpack.packb(payload, use_bin_type=True)
    if compress:
        raw = zlib.compress(raw, level=6)
    with open(path, "wb") as f:
        f.write(b"SNGZ" if compress else b"SNGR")
        f.write(raw)


def load_snapshot(path: str, hash_version: int = HASH_VERSION) -> dict:
    """Returns dict with keys: params (list of arrays), opt_state
    (list | None), density_grid (fp32 array | None), step, config,
    dataset_meta, hash_version. Caller restores pytree structure via
    tree_unflatten. Pass hash_version=1 (or build the network with
    hash_mode=\"xor\") to load .ingp-imported snapshots; pass None to
    skip the gate and check `hash_version` in the result yourself."""
    with open(path, "rb") as f:
        tag = f.read(4)
        raw = f.read()
    if tag == b"SNGZ":
        raw = zlib.decompress(raw)
    elif tag != b"SNGR":
        raise ValueError(f"{path}: not a synerfgine-tpu snapshot")
    payload = msgpack.unpackb(raw, raw=False)
    if payload.get("magic") != MAGIC:
        raise ValueError("bad snapshot magic")
    if payload.get("format_version", 0) > FORMAT_VERSION:
        raise ValueError("snapshot from a newer format version")
    hv = payload.get("hash_version", 1)
    if hash_version is not None and hv != hash_version:
        raise ValueError(
            f"{path}: hash tables were trained under hash_version {hv}, "
            f"this build indexes with hash_version {hash_version} — "
            "resuming would silently gather the wrong table rows. "
            "(hash_version 1 snapshots need hash_mode='xor' networks.)")
    out = {
        "hash_version": hv,
        "step": payload["step"],
        "config": payload["config"],
        "dataset_meta": payload["dataset_meta"],
        "params": [_unpack_array(d) for d in payload["params"]],
        "opt_state": [_unpack_array(d) for d in payload.get("opt_state", [])] or None,
        "density_grid": None,
        "grid_ema_step": payload.get("grid_ema_step", 0),
        "adaptive_rays": payload.get("adaptive_rays"),
    }
    if "density_grid" in payload:
        out["density_grid"] = _unpack_array(payload["density_grid"]).astype(np.float32)
    return out


def restore_train_state(trainer, snap: dict, key=None):
    """Rebuild a NerfTrainState from a loaded snapshot dict."""
    import jax
    import jax.numpy as jnp

    from ..train.nerf_trainer import NerfTrainState

    key = key if key is not None else jax.random.PRNGKey(0)
    ref_params = trainer.network.init(jax.random.PRNGKey(0))
    treedef = jax.tree.structure(ref_params)
    params = jax.tree.unflatten(
        treedef, [jnp.asarray(a) for a in snap["params"]]
    )
    opt_state = trainer.opt.init(params)
    if snap["opt_state"] is not None:
        odef = jax.tree.structure(opt_state)
        opt_state = jax.tree.unflatten(
            odef, [jnp.asarray(a) for a in snap["opt_state"]]
        )
    gstate = trainer.grid.init()
    if snap["density_grid"] is not None:
        gstate = gstate._replace(
            density=jnp.asarray(snap["density_grid"]),
            ema_step=jnp.asarray(snap["grid_ema_step"], jnp.int32),
        )
        gstate = trainer.grid.finalize(gstate)
    trainer.host_step = snap["step"]
    if snap.get("adaptive_rays"):
        trainer._adaptive_rays = int(snap["adaptive_rays"])
    return NerfTrainState(params, opt_state, gstate, key)
