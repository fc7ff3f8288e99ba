"""Re-test the Mosaic/Pallas VMEM vector gather on the current toolchain.

History (memory: synerfgine-tpu-perf-facts):
- rounds 2/3: `tbl[idx]` inside a Pallas TPU kernel HUNG the Mosaic
  compiler (~500 s);
- round 4: the same form fails fast — `ValueError: Shape mismatch in
  input, indices and output` (mosaic lowering _gather_lowering_rule
  wants input/indices/output ranks to match);
- round 5 (this revision): try the rank-matched forms the lowering rule
  asks for (VERDICT r4 Next #8): `take_along_axis` with indices
  broadcast to the output shape, and the flat-table 2D-index form.

If any variant compiles AND beats the XLA HBM gather, the hash encode
can keep per-level tables VMEM-resident and rewrite the transaction
floor. Each variant runs in its own subprocess under a hard timeout so
a compiler hang cannot eat the session. Prints one JSON line.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

INNER = r"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

variant = sys.argv[1]
N = 1 << 15          # gathers per call
T = 1 << 13          # table rows (VMEM-resident: 8192 x 4 fp32 = 128 KB)
F = 4
if variant == "same_shape":
    N = T            # the only shape the mosaic gather lowering accepts

def kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[...]
    idx = idx_ref[...]
    if variant == "plain":
        out_ref[...] = tbl[idx]
    elif variant == "take_along":
        # indices broadcast to the OUTPUT rank/shape (the form the
        # mosaic gather lowering checks for)
        idx2 = jnp.broadcast_to(idx[:, None], (N, F))
        out_ref[...] = jnp.take_along_axis(tbl, idx2, axis=0)
    elif variant == "flat2d":
        flat = tbl.reshape(-1)
        cols = jax.lax.broadcasted_iota(jnp.int32, (N, F), 1)
        out_ref[...] = flat[idx[:, None] * F + cols]
    elif variant == "same_shape":
        # the r5 take_along failure is an assert
        # `indices.shape == input.shape + (1,)` — i.e. the mosaic
        # gather lowers ONLY when the gather count equals the table
        # rows. Shape the probe that way (N == T): if this compiles,
        # hash gathers can tile into table-sized sample blocks.
        idx2 = jnp.broadcast_to(idx[:, None], (N, F))
        out_ref[...] = jnp.take_along_axis(tbl, idx2, axis=0)
    else:
        raise SystemExit(2)

@jax.jit
def run(tbl, idx):
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
    )(tbl, idx)

tbl = jnp.asarray(np.random.default_rng(0).normal(size=(T, F)), jnp.float32)
idx = jnp.asarray(np.random.default_rng(1).integers(0, T, N), jnp.int32)
t0 = time.time()
out = run(tbl, idx)
out.block_until_ready()
compile_s = time.time() - t0
ref = np.asarray(tbl)[np.asarray(idx)]
ok = np.allclose(np.asarray(out), ref)
t0 = time.time()
for _ in range(20):
    out = run(tbl, idx)
float(out.sum())
per_call_ms = (time.time() - t0) / 20 * 1e3
# XLA reference gather on the same shapes for the speed comparison
xg = jax.jit(lambda tbl, idx: tbl[idx])
xg(tbl, idx).block_until_ready()
t0 = time.time()
for _ in range(20):
    o2 = xg(tbl, idx)
float(o2.sum())
xla_ms = (time.time() - t0) / 20 * 1e3
print(f"RESULT {compile_s:.1f} {per_call_ms:.3f} {xla_ms:.3f} {ok}")
"""


def run_variant(name: str, timeout_s: int = 300) -> dict:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", INNER, name],
                           capture_output=True, text=True,
                           timeout=timeout_s)
        line = next((l for l in (r.stdout or "").splitlines()
                     if l.startswith("RESULT")), None)
        if r.returncode == 0 and line:
            _, compile_s, per_call_ms, xla_ms, ok = line.split()
            return {"variant": name, "status": "compiles",
                    "compile_s": float(compile_s),
                    "per_call_ms": float(per_call_ms),
                    "xla_gather_ms": float(xla_ms),
                    "correct": ok == "True"}
        return {"variant": name, "status": "error",
                "detail": (r.stderr or "")[-400:]}
    except subprocess.TimeoutExpired:
        return {"variant": name, "status": "hang",
                "detail": f"no result in {timeout_s}s "
                          f"(wall {time.time()-t0:.0f}s)"}


def main():
    rows = [run_variant(v) for v in ("same_shape", "take_along",
                                     "flat2d", "plain")]
    print(json.dumps({"metric": "mosaic_vmem_gather",
                      "n_gathers": 1 << 15, "variants": rows}))


if __name__ == "__main__":
    main()
