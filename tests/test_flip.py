import numpy as np

from synerfgine_tpu.eval.flip import flip


def _img(seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)


def test_flip_identical_is_zero():
    a = _img()
    out = flip(a, a)
    assert out["mean"] < 1e-6
    assert out["map"].shape == (64, 64)


def test_flip_monotone_in_error():
    a = _img()
    small = np.clip(a + 0.02, 0, 1)
    big = np.clip(a + 0.3, 0, 1)
    assert flip(a, small)["mean"] < flip(a, big)["mean"]
    assert 0.0 <= flip(a, big)["mean"] <= 1.0


def test_flip_detects_structure():
    a = np.full((64, 64, 3), 0.5, np.float32)
    b = a.copy()
    b[30:34, :, :] = 0.9  # edge structure
    out = flip(a, b)
    # error concentrated near the stripe
    assert out["map"][31].mean() > out["map"][5].mean() * 2
