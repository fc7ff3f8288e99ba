"""Pixel-gradient parity: jax.grad of our compositing must equal the
analytic gradient the reference hand-writes in its fused loss kernel
(testbed_nerf.cu:1218-1272 'suffix trick'), derived here independently:

  C = sum_i T_i a_i c_i + T_N bg,  T_i = prod_{j<i}(1-a_j),
  a_i = 1-exp(-s_i dt_i), s_i = exp(raw_s_i), c_i = sigmoid(raw_c_i)

  dC/draw_c_i = T_i a_i * c_i(1-c_i)
  dC/draw_s_i = dt_i s_i * [(1-a_i) T_i c_i - suffix_i] where
  suffix_i = sum_{j>i} T_j a_j c_j + T_N bg   (everything composited
  after i, which an increase of sigma_i occludes); the (1-a_i) is
  da_i/d(s_i dt_i) = exp(-s_i dt_i).
"""
import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.march.composite import composite_rays


def _analytic_grads(raw_rgb, raw_sigma, dt, bg, gC):
    """Reference-math gradients, serial numpy. gC: (R, 3) upstream grad."""
    R, K, _ = raw_rgb.shape
    g_rgb = np.zeros_like(raw_rgb)
    g_sigma = np.zeros_like(raw_sigma)
    for r in range(R):
        c = 1 / (1 + np.exp(-raw_rgb[r]))          # (K, 3)
        s = np.exp(raw_sigma[r])                   # (K,)
        a = 1 - np.exp(-s * dt[r])
        T = np.concatenate([[1.0], np.cumprod(1 - a)[:-1]])
        w = T * a
        T_final = np.prod(1 - a)
        # suffix_i = contribution composited after sample i (incl. bg)
        contrib = w[:, None] * c                   # (K, 3)
        suffix = np.zeros((K, 3))
        acc = T_final * bg[r]
        for i in range(K - 1, -1, -1):
            suffix[i] = acc
            acc = acc + contrib[i]
        g_rgb[r] = (w[:, None] * c * (1 - c)) * gC[r][None, :]
        g_sigma[r] = (dt[r] * s) * np.sum(
            (((1 - a) * T)[:, None] * c - suffix) * gC[r][None, :], axis=-1)
    return g_rgb, g_sigma


def test_composite_gradients_match_reference_math():
    rng = np.random.default_rng(11)
    R, K = 6, 48
    raw_rgb = rng.normal(size=(R, K, 3)).astype(np.float64)
    raw_sigma = (rng.normal(size=(R, K)) * 1.5).astype(np.float64)
    dt = np.full((R, K), 0.02)
    t = np.cumsum(dt, 1)
    bg = rng.uniform(0, 1, (R, 3))
    gC = rng.normal(size=(R, 3))

    def model(rrgb, rsig):
        comp = composite_rays(rrgb, rsig, jnp.asarray(dt), jnp.asarray(t),
                              min_transmittance=0.0)
        pred = comp.rgb + comp.transmittance[:, None] * jnp.asarray(bg)
        return jnp.sum(pred * jnp.asarray(gC))

    g_rgb_jax, g_sig_jax = jax.grad(model, argnums=(0, 1))(
        jnp.asarray(raw_rgb, jnp.float32), jnp.asarray(raw_sigma, jnp.float32))
    g_rgb_ref, g_sig_ref = _analytic_grads(raw_rgb, raw_sigma, dt, bg, gC)

    np.testing.assert_allclose(np.asarray(g_rgb_jax), g_rgb_ref,
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(g_sig_jax), g_sig_ref,
                               atol=2e-4, rtol=2e-3)
