"""Reference `.ingp` snapshot interchange (import AND export).

The reference's flagship demo flow loads a trained `.ingp` and replays it
hybrid (SURVEY.md §3.5; /root/reference/src/testbed.cu:4878-4992
load_snapshot). Container: nlohmann-json serialized as msgpack, wrapped
in a zlib stream for `.ingp` (testbed.cu:4868-4872 zstr), holding the
network-config json plus a "snapshot" object:

  snapshot.version                 = 1 (SNAPSHOT_FORMAT_VERSION,
                                       testbed.cu:4810)
  snapshot.mode                    = "nerf"
  snapshot.density_grid_size       = 128
  snapshot.density_grid_binary     = fp16 little-endian blob,
                                     128^3 x (max_cascade+1) cells
  snapshot.nerf.aabb_scale, nerf.rgb.{rays_per_batch, ...}
  snapshot.training_step, loss
  + tiny-cuda-nn Trainer::serialize fields: n_params, params_type
    ("__half"), params_binary (the packed parameter vector).

Parameter-vector layout (nerf_network.h:356-371 packing order):
  [density MLP layers][rgb MLP layers][hash-grid table][dir encoding: 0]
Each FullyFusedMLP layer is a row-major (n_output_padded, n_input)
matrix (layer_sizes() order; see testbed.cu:583-589
dump_parameters_as_images, which writes each layer as a
size.first x size.second image); output widths are padded to 16. The
hash table is level-packed (entry, feature) AoS, level sizes aligned to
multiples of 8 — identical to nn/hash_encoding.py's layout. Hashed
levels are indexed with the tcnn XOR hash, so imported tables must be
used with `HashEncoding(hash_mode="xor")` (hash_version 1).
"""
from __future__ import annotations

import zlib

import msgpack
import numpy as np

NGP_SNAPSHOT_VERSION = 1


# ------------------------------------------------------------ container
def read_ingp(path: str) -> dict:
    """Parse an .ingp/.msgpack file into the config dict (binary fields
    as bytes)."""
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:1] == b"\x78":          # zlib stream (zstr)
        raw = zlib.decompress(raw)
    return msgpack.unpackb(raw, raw=False, strict_map_key=False)


def write_ingp(path: str, config: dict, compress: bool = True):
    raw = msgpack.packb(config, use_bin_type=True)
    if compress:
        raw = zlib.compress(raw, 6)
    with open(path, "wb") as f:
        f.write(raw)


# ------------------------------------------------------- param splitting
def _mlp_layer_shapes(n_in: int, n_neurons: int, n_hidden: int,
                      n_out: int) -> list[tuple[int, int]]:
    """(rows=outputs, cols=inputs) per layer, output padded to 16
    (FullyFusedMLP padded_output_width)."""
    pad = lambda n: ((n + 15) // 16) * 16
    dims = [n_in] + [n_neurons] * n_hidden + [pad(n_out)]
    return [(dims[i + 1], dims[i]) for i in range(len(dims) - 1)]


def split_ingp_params(net, vec: np.ndarray):
    """Split the packed reference parameter vector into NerfParams
    arrays for `net` (a NerfNetwork built from the embedded config with
    hash_mode=\"xor\")."""
    from ..nn.nerf_network import NerfParams

    enc = net.pos_encoding
    d_shapes = _mlp_layer_shapes(
        enc.n_output_dims, net.density_mlp.n_neurons,
        net.density_mlp.n_hidden_layers, net.density_mlp.n_output)
    r_shapes = _mlp_layer_shapes(
        net.rgb_mlp.n_input, net.rgb_mlp.n_neurons,
        net.rgb_mlp.n_hidden_layers, net.rgb_mlp.n_output)

    off = 0

    def take(shape):
        nonlocal off
        n = shape[0] * shape[1]
        a = vec[off:off + n].reshape(shape)
        off += n
        return a

    density, rgb = [], []
    for shp in d_shapes:
        a = take(shp)                                  # (out_pad, in)
        density.append(np.ascontiguousarray(a.T))       # -> (in, out)
    # crop the padded output of the last density layer
    density[-1] = density[-1][:, :net.density_mlp.n_output]
    for shp in r_shapes:
        a = take(shp)
        rgb.append(np.ascontiguousarray(a.T))
    rgb[-1] = rgb[-1][:, :net.rgb_mlp.n_output]

    n_table = enc.n_params * enc.F
    table = vec[off:off + n_table].reshape(enc.n_params, enc.F)
    off += n_table
    if off != vec.size:
        raise ValueError(
            f"parameter count mismatch: consumed {off}, blob has "
            f"{vec.size} (config/network shape disagreement)")
    return NerfParams(
        hash_table=np.ascontiguousarray(table, dtype=np.float32),
        density_mlp=[np.asarray(a, np.float32) for a in density],
        rgb_mlp=[np.asarray(a, np.float32) for a in rgb],
    )


def _pack_params(net, params) -> np.ndarray:
    """Inverse of split_ingp_params: NerfParams -> packed fp32 vector."""
    pieces = []
    pad16 = lambda n: ((n + 15) // 16) * 16

    def add_mlp(mats, n_out):
        for i, m in enumerate(mats):
            m = np.asarray(m, np.float32)
            if i == len(mats) - 1 and m.shape[1] < pad16(n_out):
                m = np.concatenate(
                    [m, np.zeros((m.shape[0], pad16(n_out) - m.shape[1]),
                                 np.float32)], axis=1)
            pieces.append(np.ascontiguousarray(m.T).reshape(-1))

    add_mlp(params.density_mlp, net.density_mlp.n_output)
    add_mlp(params.rgb_mlp, net.rgb_mlp.n_output)
    pieces.append(np.asarray(params.hash_table, np.float32).reshape(-1))
    return np.concatenate(pieces)


# ------------------------------------------------------------ import/export
def import_ingp(path: str, out_path: str) -> dict:
    """Convert a reference .ingp into a native snapshot (hash_version 1).
    Returns {config, step, aabb_scale} for the caller to report."""
    from ..core.config import NGPNetworkConfig
    from ..nn.nerf_network import NerfNetwork
    from .snapshot import save_snapshot

    cfg_json = read_ingp(path)
    snap = cfg_json.get("snapshot")
    if snap is None:
        raise ValueError(f"{path}: no 'snapshot' object (a bare network "
                         "config, not a trained snapshot)")
    if snap.get("version", 0) < NGP_SNAPSHOT_VERSION:
        raise ValueError("snapshot uses an old reference format")
    mode = snap.get("mode", "nerf")
    if mode != "nerf":
        raise ValueError(f"only nerf-mode snapshots supported, got {mode}")

    aabb_scale = int(snap.get("nerf", {}).get("aabb_scale", 1))
    cfg = NGPNetworkConfig.from_json(
        {k: v for k, v in cfg_json.items() if k != "snapshot"})
    net = NerfNetwork(cfg, aabb_scale=aabb_scale, hash_mode="xor")

    ptype = snap.get("params_type", "__half")
    dt = np.float16 if ptype == "__half" else np.float32
    blob = snap.get("params_binary")
    if blob is None:
        raise ValueError("snapshot has no params_binary")
    vec = np.frombuffer(blob, dt).astype(np.float32)
    params = split_ingp_params(net, vec)

    grid = None
    if "density_grid_binary" in snap:
        g = np.frombuffer(snap["density_grid_binary"], np.float16)
        G = int(snap.get("density_grid_size", 128))
        C = g.size // G**3
        grid = g.reshape(C, G, G, G).astype(np.float32)

    payload_grid = None
    if grid is not None:
        from ..grid.occupancy import OccupancyGrid, OccupancyGridState

        og = OccupancyGrid(aabb_scale)
        gstate = og.init()._replace(density=grid)
        payload_grid = og.finalize(gstate)

    save_snapshot(
        out_path, params,
        grid_state=payload_grid,
        step=int(snap.get("training_step", 0)),
        config={"network": "imported-ingp"},
        dataset_meta={"aabb_scale": aabb_scale,
                      "imported_from": str(path)},
        hash_version=1,
    )
    return {"step": int(snap.get("training_step", 0)),
            "aabb_scale": aabb_scale,
            "n_params": int(vec.size)}


def export_ingp(path: str, net, params, grid_state=None, step: int = 0,
                aabb_scale: int = 1, config_json: dict | None = None,
                loss: float = 0.0):
    """Write a reference-format .ingp from native params (the inverse
    interchange; hashed levels are only meaningful if `net` was built
    with hash_mode=\"xor\")."""
    vec = _pack_params(net, params)
    snap = {
        "version": NGP_SNAPSHOT_VERSION,
        "mode": "nerf",
        "training_step": int(step),
        "loss": float(loss),
        "n_params": int(vec.size),
        "params_type": "__half",
        "params_binary": vec.astype(np.float16).tobytes(),
        "nerf": {
            "aabb_scale": int(aabb_scale),
            "rgb": {"rays_per_batch": 4096,
                    "measured_batch_size": 1 << 18,
                    "measured_batch_size_before_compaction": 1 << 18},
        },
    }
    if grid_state is not None:
        g = np.asarray(grid_state.density, np.float16)
        snap["density_grid_size"] = g.shape[-1]
        snap["density_grid_binary"] = g.tobytes()
    cfg = dict(config_json or {})
    cfg["snapshot"] = snap
    write_ingp(path, cfg, compress=True)
