"""The driver's entry points must always work: single-chip compile check
and the 8-virtual-device full-training-step dry run."""
import jax
import numpy as np


def test_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (8192, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
