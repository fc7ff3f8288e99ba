"""End-to-end stage-1 slice: fit a small image, PSNR must climb.

This is the fast CPU-runnable e2e fit test from SURVEY.md §4 (b): the
image-mode config + albert.exr stand in for the full NeRF loop while
pinning hash-interp/optimizer numerics.
"""
import numpy as np
import jax
import pytest

from synerfgine_tpu.core.config import NGPNetworkConfig
from synerfgine_tpu.io import read_image
from synerfgine_tpu.train.image_fit import fit_image, bilinear_sample

import jax.numpy as jnp


def test_bilinear_sample_exact_at_centers():
    img = jnp.arange(12.0).reshape(3, 4, 1)
    # pixel centers
    uv = jnp.array([[(x + 0.5) / 4, (y + 0.5) / 3] for y in range(3) for x in range(4)])
    vals = bilinear_sample(img, uv)
    np.testing.assert_allclose(np.asarray(vals).ravel(), np.arange(12.0), atol=1e-5)


def test_bilinear_sample_midpoint():
    img = jnp.array([[[0.0], [1.0]], [[2.0], [3.0]]])
    v = bilinear_sample(img, jnp.array([[0.5, 0.5]]))
    assert np.isclose(float(v[0, 0]), 1.5)


def test_image_fit_albert_psnr(albert_exr):
    img = read_image(str(albert_exr))[..., :3]
    # downsample 4x for CPU speed
    small = img[::4, ::4]
    cfg = NGPNetworkConfig.from_json("/root/reference/configs/image/base.json")
    assert cfg.loss == "l2"
    assert cfg.encoding.n_levels == 16
    trainer, state, losses = fit_image(
        small, cfg, n_steps=150, batch_size=1 << 14, seed=1
    )
    mse0 = np.mean(small**2)  # vs black
    mse = trainer.compute_mse(state)
    psnr = -10 * np.log10(mse)
    # after 150 steps the fit must be far better than trivial predictors
    assert mse < float(np.mean((small - small.mean((0, 1))) ** 2)) * 0.5
    assert psnr > 20.0, f"psnr={psnr}"
    assert losses[-1] < losses[0] * 0.2
