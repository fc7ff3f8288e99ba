import numpy as np

from synerfgine_tpu.data.sharpness import sharpness_maps, sharpness_weights


def test_sharpness_detects_texture():
    rng = np.random.default_rng(0)
    img = np.full((1, 64, 64, 3), 0.5, np.float32)
    # noisy (sharp) quadrant
    img[0, :32, :32] += rng.normal(0, 0.2, (32, 32, 3)).astype(np.float32)
    m = sharpness_maps(img, grid=4)
    assert m.shape == (1, 4, 4)
    assert m[0, 0, 0] > m[0, 3, 3] * 5


def test_sharpness_weights_normalized():
    maps = np.array([[[0.0, 1.0], [2.0, 3.0]]], np.float32)
    w = sharpness_weights(maps)
    assert abs(w.mean() - max(w.mean(), 0.1)) < 1.0
    assert w.min() >= 0.1
    assert w[0, 1, 1] > w[0, 0, 1]
