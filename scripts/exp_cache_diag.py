"""Diagnose persistent-compile-cache behavior through the axon relay
(VERDICT r3 Weak #6: bench warmup was 5 min for 288 steps despite
.jax_cache being committed).

Runs the SAME nontrivial jitted program in two fresh subprocesses with
the persistent cache enabled and compares first-call latency; a second
run as slow as the first means compiles are NOT cached across processes
(e.g. server-side AOT through the relay bypasses the local cache), and
bench warmup time is structural rather than fixable by cache priming.
Prints one JSON line.
"""
from __future__ import annotations

import json
import subprocess
import sys
import time

INNER = r"""
import time
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# a compile-heavy but fast-to-run program (scan of fused elementwise+
# matmul blocks, static shapes, unique enough to not collide with the
# trainer's entries)
@jax.jit
def prog(x, w):
    def body(c, _):
        c = jnp.tanh(c @ w) + 0.125 * c
        c = c * jax.nn.sigmoid(c[:, :1])
        return c, jnp.sum(c)
    c, s = jax.lax.scan(body, x, None, length=48)
    return c, s

x = jnp.ones((256, 512), jnp.float32) * 0.01
w = jnp.eye(512, dtype=jnp.float32)
t0 = time.time()
c, s = prog(x, w)
float(s.sum())
print(f"FIRST {time.time()-t0:.2f}")
t0 = time.time()
c, s = prog(x, w)
float(s.sum())
print(f"SECOND {time.time()-t0:.3f}")
"""


def one_run():
    r = subprocess.run([sys.executable, "-c", INNER], capture_output=True,
                       text=True, timeout=900)
    first = second = None
    for l in (r.stdout or "").splitlines():
        if l.startswith("FIRST"):
            first = float(l.split()[1])
        if l.startswith("SECOND"):
            second = float(l.split()[1])
    if first is None:
        sys.stderr.write((r.stderr or "")[-800:])
    return first, second


def main():
    a_first, a_second = one_run()
    b_first, b_second = one_run()
    verdict = (
        "cache works across processes" if (b_first or 9e9) < 0.35 * (a_first or 1)
        else "compiles NOT cached across processes (relay-side AOT?)")
    print(json.dumps({
        "metric": "compile_cache_diag",
        "run1_first_s": a_first, "run1_steady_s": a_second,
        "run2_first_s": b_first, "run2_steady_s": b_second,
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
