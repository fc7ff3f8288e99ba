"""FXAA + foveation unwarp (render/fxaa.py, main.frag parity)."""
import jax
import jax.numpy as jnp
import numpy as np

from synerfgine_tpu.render.fxaa import FoveationWarp, fxaa


def test_fxaa_smooths_jaggies():
    """A hard diagonal edge loses contrast variance; flat areas pass
    through unchanged."""
    H = W = 32
    yy, xx = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    img = ((xx + yy) < H).astype(np.float32)[..., None].repeat(3, -1)
    out = np.asarray(fxaa(jnp.asarray(img)))
    assert out.shape == img.shape
    assert np.isfinite(out).all()
    # interior flat regions untouched
    np.testing.assert_allclose(out[2:6, 2:6], img[2:6, 2:6], atol=1e-6)
    # edge pixels get blended (strictly between 0 and 1 somewhere)
    edge = np.abs(xx + yy - H) <= 1
    blended = (out[..., 0] > 0.02) & (out[..., 0] < 0.98)
    assert (blended & edge).sum() > 0


def test_fxaa_constant_image_fixed_point():
    img = jnp.full((16, 16, 3), 0.37)
    np.testing.assert_allclose(np.asarray(fxaa(img)), 0.37, atol=1e-6)


def test_foveation_unwarp_inverts_warp():
    # a non-trivial warp: quadratic flanks around a linear center band
    w = FoveationWarp(al=0.5, bl=0.75, cl=0.0, am=1.25, bm=-0.0625,
                      ar=0.5, br=-0.25, cr=0.5 * 0.64 + 0.25 * 0.8,
                      switch_left=0.25, switch_right=0.75,
                      inv_switch_left=0.25 * 1.25 - 0.0625,
                      inv_switch_right=0.75 * 1.25 - 0.0625)
    # warp() must be continuous-ish and unwarp(warp(x)) == x in the band
    x = jnp.linspace(0.26, 0.74, 25)
    np.testing.assert_allclose(np.asarray(w.unwarp(w.warp(x))),
                               np.asarray(x), atol=1e-5)
    ident = FoveationWarp.identity()
    x = jnp.linspace(0, 1, 11)
    np.testing.assert_allclose(np.asarray(ident.warp(x)), np.asarray(x),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(ident.unwarp(x)), np.asarray(x),
                               atol=1e-6)
