"""Re-test the Mosaic/Pallas VMEM vector gather on the current toolchain.

Round-2/3 status: `tbl[idx]` inside a Pallas TPU kernel hung the Mosaic
compiler (~500 s) — all hash gathers therefore run as XLA HBM gathers.
Re-run each toolchain release (memory: synerfgine-tpu-perf-facts). If
this ever compiles AND beats the XLA gather, the hash encode can keep
per-level tables VMEM-resident and drop the HBM transaction floor.

Runs under a hard timeout in a subprocess so a compiler hang cannot eat
the session. Prints one JSON line.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

INNER = r"""
import time
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

N = 1 << 15          # gathers per call
T = 1 << 13          # table rows (VMEM-resident: 8192 x 4 fp32 = 128 KB)
F = 4

def kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[...]
    idx = idx_ref[...]
    out_ref[...] = tbl[idx]          # the vector gather in question

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
print(f"RESULT {compile_s:.1f} {per_call_ms:.3f} {ok}")
"""


def main():
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", INNER],
                           capture_output=True, text=True, timeout=600)
        out = r.stdout
        line = next((l for l in out.splitlines() if l.startswith("RESULT")),
                    None)
        if r.returncode == 0 and line:
            _, compile_s, per_call_ms, ok = line.split()
            print(json.dumps({
                "metric": "mosaic_vmem_gather", "status": "compiles",
                "compile_s": float(compile_s),
                "per_call_ms": float(per_call_ms),
                "correct": ok == "True",
                "n_gathers": 1 << 15,
            }))
            return
        status = "error"
        detail = (r.stderr or "")[-500:]
    except subprocess.TimeoutExpired:
        status = "hang"
        detail = f"compiler did not finish within 600 s (wall {time.time()-t0:.0f}s)"
    print(json.dumps({"metric": "mosaic_vmem_gather", "status": status,
                      "detail": detail}))


if __name__ == "__main__":
    main()
