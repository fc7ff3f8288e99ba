import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.nn.hash_encoding import HashEncoding, _PRIMES
from synerfgine_tpu.nn.sh_encoding import sh_encode
from synerfgine_tpu.nn.mlp import MLP
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.nn import losses
from synerfgine_tpu.nn.optimizers import NGPOptimizer, lr_at_step
from synerfgine_tpu.core.config import OptimizerConfig, AdamConfig, ExponentialDecayConfig


# ---------------------------------------------------------------- hash grid
def _numpy_hash_encode(table, x, enc: HashEncoding):
    """Independent NumPy reference for the hash-grid forward."""
    N = x.shape[0]
    out = np.zeros((N, enc.n_levels * enc.F), np.float32)
    for l in range(enc.n_levels):
        scale = enc.scales[l]
        res = enc.resolutions[l]
        pos = x * scale + 0.5
        idx0 = np.floor(pos).astype(np.int64)
        frac = pos - idx0
        acc = np.zeros((N, enc.F), np.float32)
        for c in range(2**enc.n_dims):
            bits = [(c >> d) & 1 for d in range(enc.n_dims)]
            coord = np.clip(idx0 + np.array(bits), 0, res - 1)
            w = np.ones(N, np.float32)
            for d in range(enc.n_dims):
                w *= frac[:, d] if bits[d] else 1.0 - frac[:, d]
            if enc.level_is_dense[l]:
                idx = np.zeros(N, np.int64)
                stride = 1
                for d in range(enc.n_dims):
                    idx += coord[:, d] * stride
                    stride *= res
            else:
                # x combined additively (aligned-pair invariant:
                # h(x+1) = h(x)+1 mod size); other dims XOR'd with primes
                h = np.zeros(N, np.uint32)
                for d in range(1, enc.n_dims):
                    h = h ^ (coord[:, d].astype(np.uint32) * np.uint32(_PRIMES[d]))
                h = coord[:, 0].astype(np.uint32) + h
                idx = (h % np.uint32(enc.hashmap_size)).astype(np.int64)
            acc += table[idx + enc.level_offsets[l]] * w[:, None]
        out[:, l * enc.F : (l + 1) * enc.F] = acc
    return out

    # NOTE: corner bit order differs from the jnp impl (meshgrid 'ij' puts
    # dim0 as the outer bit) — irrelevant because the corner sum is order-
    # independent; the bits->dims mapping is what matters.


def test_hash_encoding_matches_numpy_reference():
    enc = HashEncoding(n_levels=8, n_features_per_level=4, log2_hashmap_size=19,
                       base_resolution=16, per_level_scale=2.0)
    # L0..L4 dense (16..256 -> 257^3 > 2^19 means L4 (res 129) is hashed:
    # 129^3 = 2146689 > 524288). Check the computed split:
    assert enc.level_is_dense[0] and enc.level_is_dense[1]
    rng = np.random.default_rng(3)
    table = rng.normal(size=(enc.n_params, enc.F)).astype(np.float32) * 0.1
    x = rng.uniform(0, 1, size=(512, 3)).astype(np.float32)
    got = np.asarray(enc(jnp.asarray(table), jnp.asarray(x)))
    want = _numpy_hash_encode(table, x, enc)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_hash_encoding_2d():
    enc = HashEncoding(n_levels=8, n_features_per_level=4, log2_hashmap_size=15,
                       base_resolution=16, per_level_scale=1.5, n_dims=2)
    rng = np.random.default_rng(4)
    table = rng.normal(size=(enc.n_params, enc.F)).astype(np.float32) * 0.1
    x = rng.uniform(0, 1, size=(256, 2)).astype(np.float32)
    got = np.asarray(enc(jnp.asarray(table), jnp.asarray(x)))
    want = _numpy_hash_encode(table, x, enc)
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_hash_encoding_interpolation_continuity():
    """Feature must be continuous across a voxel boundary."""
    enc = HashEncoding(n_levels=2, n_features_per_level=2, base_resolution=16,
                       per_level_scale=2.0)
    key = jax.random.PRNGKey(0)
    table = jax.random.normal(key, (enc.n_params, enc.F))
    eps = 1e-5
    # straddle the boundary between voxels at x=0.5 for level 0
    xa = jnp.array([[0.5 - eps, 0.3, 0.3]])
    xb = jnp.array([[0.5 + eps, 0.3, 0.3]])
    fa, fb = enc(table, xa), enc(table, xb)
    np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-3)


def test_hash_encoding_gradient_scatter():
    """d(sum(output))/d(table) == accumulated interpolation weights, i.e.
    the scatter-add backward is the transpose of the gather forward."""
    enc = HashEncoding(n_levels=2, n_features_per_level=1, base_resolution=4,
                       per_level_scale=2.0, log2_hashmap_size=10)
    table = jnp.zeros((enc.n_params, 1))
    x = jnp.asarray(np.random.default_rng(5).uniform(0.1, 0.9, (32, 3)), jnp.float32)
    g = jax.grad(lambda t: jnp.sum(enc(t, x)))(table)
    # each sample contributes total weight 1.0 per level
    assert np.isclose(float(jnp.sum(g)), 32 * enc.n_levels, atol=1e-3)
    assert float(jnp.min(g)) >= 0.0


def test_hash_encoding_level_mask():
    enc = HashEncoding(n_levels=4, n_features_per_level=2, base_resolution=8)
    key = jax.random.PRNGKey(1)
    table = jax.random.normal(key, (enc.n_params, enc.F))
    x = jax.random.uniform(key, (16, 3))
    mask = jnp.array([1.0, 1.0, 0.0, 0.0])
    out = enc(table, x, level_mask=mask)
    assert np.allclose(np.asarray(out[:, 4:]), 0.0)
    assert not np.allclose(np.asarray(out[:, :4]), 0.0)


# ---------------------------------------------------------------------- SH
def test_sh_orthonormality():
    """Real SH basis: ∫ Y_i Y_j dΩ = δ_ij (Monte Carlo over the sphere)."""
    rng = np.random.default_rng(6)
    v = rng.normal(size=(400_000, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    Y = np.asarray(sh_encode(jnp.asarray((v + 1) / 2, jnp.float32), degree=4))
    G = (Y.T @ Y) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(G, np.eye(16), atol=5e-2)


# --------------------------------------------------------------------- MLP
def test_mlp_shapes_and_dtype():
    mlp = MLP(32, 16, n_neurons=64, n_hidden_layers=1)
    params = mlp.init(jax.random.PRNGKey(0))
    assert [p.shape for p in params] == [(32, 64), (64, 16)]
    x = jnp.ones((128, 32))
    y = mlp(params, x)
    assert y.shape == (128, 16)
    assert y.dtype == jnp.float32  # fp32 accumulate out


def test_mlp_is_bias_free_and_relu():
    mlp = MLP(8, 4, n_neurons=16, n_hidden_layers=2)
    params = mlp.init(jax.random.PRNGKey(0))
    y0 = mlp(params, jnp.zeros((4, 8)))
    np.testing.assert_allclose(np.asarray(y0), 0.0)  # no biases => f(0)=0


# -------------------------------------------------------------------- losses
def test_huber_matches_reference_semantics():
    p = jnp.array([0.0, 0.05, 0.2, -0.3])
    t = jnp.zeros(4)
    v = np.asarray(losses.huber(p, t))
    a = 0.1
    want = np.where(np.abs(np.asarray(p)) < a,
                    0.5 * np.asarray(p) ** 2 / a,
                    np.abs(np.asarray(p)) - a / 2) / 5.0
    np.testing.assert_allclose(v, want, atol=1e-7)
    # gradient continuity at the knee
    g = jax.grad(lambda x: losses.huber(x, jnp.zeros(())).sum())(jnp.array(a))
    g2 = jax.grad(lambda x: losses.huber(x, jnp.zeros(())).sum())(jnp.array(a - 1e-6))
    assert abs(float(g) - float(g2)) < 1e-3


# ----------------------------------------------------------------- optimizer
def test_lr_decay_schedule():
    cfg = OptimizerConfig(
        adam=AdamConfig(learning_rate=1e-2),
        decay=ExponentialDecayConfig(decay_start=20000, decay_interval=10000, decay_base=0.33),
    )
    assert np.isclose(float(lr_at_step(cfg, jnp.array(0))), 1e-2)
    assert np.isclose(float(lr_at_step(cfg, jnp.array(20000))), 1e-2)
    assert np.isclose(float(lr_at_step(cfg, jnp.array(30000))), 1e-2 * 0.33)
    assert np.isclose(float(lr_at_step(cfg, jnp.array(40000))), 1e-2 * 0.33**2)


def test_adam_converges_quadratic():
    opt = NGPOptimizer(OptimizerConfig(adam=AdamConfig(learning_rate=0.1, l2_reg=0.0)))
    params = {"w": jnp.array([5.0, -3.0])}
    state = opt.init(params)
    target = jnp.array([1.0, 2.0])
    loss_fn = lambda p: jnp.sum((p["w"] - target) ** 2)
    for _ in range(300):
        g = jax.grad(loss_fn)(params)
        params, state = opt.update(g, state, params)
    np.testing.assert_allclose(np.asarray(params["w"]), np.asarray(target), atol=1e-2)


def test_adam_skip_zero_grad_freezes_untouched_rows():
    """With skip_zero_grad, hash rows whose gradient is exactly 0 keep
    their params AND moments (instant-ngp paper / tcnn skip_zero_grad);
    without it, stale momentum keeps moving them."""
    from synerfgine_tpu.nn.nerf_network import NerfParams

    def mk(skip):
        opt = NGPOptimizer(
            OptimizerConfig(adam=AdamConfig(learning_rate=0.1, l2_reg=0.0)),
            skip_zero_grad=skip)
        params = NerfParams(hash_table=jnp.ones((8, 2)),
                            density_mlp=[jnp.ones((2, 2))],
                            rgb_mlp=[jnp.ones((2, 2))])
        state = opt.init(params)
        g_hot = params._replace(
            hash_table=jnp.zeros((8, 2)).at[0].set(1.0),
            density_mlp=[jnp.ones((2, 2))], rgb_mlp=[jnp.ones((2, 2))])
        g_zero = params._replace(
            hash_table=jnp.zeros((8, 2)),
            density_mlp=[jnp.ones((2, 2))], rgb_mlp=[jnp.ones((2, 2))])
        # step 1: row 0 gets gradient; step 2: nobody does
        params, state = opt.update(g_hot, state, params)
        p_after_1 = np.asarray(params.hash_table).copy()
        params, state = opt.update(g_zero, state, params)
        return p_after_1, np.asarray(params.hash_table)

    p1, p2 = mk(skip=True)
    # rows 1..7 never saw a gradient: identical to init both steps
    np.testing.assert_array_equal(p1[1:], np.ones((7, 2)))
    np.testing.assert_array_equal(p2[1:], np.ones((7, 2)))
    # row 0 moved on step 1 but is frozen on the zero-grad step 2
    assert not np.allclose(p1[0], 1.0)
    np.testing.assert_array_equal(p2[0], p1[0])

    p1, p2 = mk(skip=False)
    # default behavior: momentum keeps moving row 0 on the zero-grad step
    assert not np.allclose(p2[0], p1[0])


def test_ema_params_trail_raw():
    opt = NGPOptimizer(OptimizerConfig(adam=AdamConfig(learning_rate=1.0)))
    params = {"w": jnp.zeros(1)}
    state = opt.init(params)
    g = {"w": jnp.array([-1.0])}
    params, state = opt.update(g, state, params)
    raw = float(params["w"][0])
    ema = float(opt.inference_params(state)["w"][0])
    assert 0 < ema < raw  # EMA lags behind


# ------------------------------------------------------------- nerf network
def test_nerf_network_shapes():
    net = NerfNetwork()
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (256, 3))
    d = jax.random.uniform(jax.random.PRNGKey(2), (256, 3))
    out = net.forward(params, x, d)
    assert out.shape == (256, 4)
    dens = net.density(params, x)
    assert dens.shape == (256, 16)
    # density channel of full fwd == channel 0 of density path
    np.testing.assert_allclose(np.asarray(out[:, 3]), np.asarray(dens[:, 0]), rtol=1e-3, atol=1e-3)


def test_nerf_network_grad_flows():
    net = NerfNetwork()
    params = net.init(jax.random.PRNGKey(0))
    x = jax.random.uniform(jax.random.PRNGKey(1), (64, 3))
    d = jax.random.uniform(jax.random.PRNGKey(2), (64, 3))

    def loss(p):
        out = net.forward(p, x, d)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    g = jax.grad(loss)(params)
    assert float(jnp.sum(jnp.abs(g.hash_table))) > 0
    assert all(float(jnp.sum(jnp.abs(w))) > 0 for w in g.density_mlp)
    assert all(float(jnp.sum(jnp.abs(w))) > 0 for w in g.rgb_mlp)


# ------------------------------------------------------------ aligned pairs
def test_paired_encode_matches_plain():
    """Aligned-pair (4x double-width gather) forward == 8-corner forward,
    incl. hashed levels and the x=0/x=1 clip boundaries."""
    enc = HashEncoding(n_levels=6, n_features_per_level=4,
                       log2_hashmap_size=12, base_resolution=16,
                       per_level_scale=2.0)
    assert not all(enc.level_is_dense)  # exercise hashed levels too
    rng = np.random.default_rng(7)
    table = jnp.asarray(rng.normal(size=(enc.n_params, enc.F)), jnp.float32)
    x = rng.uniform(0, 1, size=(512, 3)).astype(np.float32)
    x[:8] = 0.0
    x[8:16] = 1.0
    x[16:24, 0] = 1.0  # x-boundary: the pair-shift + fx saturation path
    x = jnp.asarray(x)
    want = enc(table, x)
    got = enc.paired_encode(enc.make_paired_table(table), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_paired_encode_matches_plain_2d():
    enc = HashEncoding(n_levels=6, n_features_per_level=2,
                       log2_hashmap_size=10, base_resolution=8,
                       per_level_scale=1.5, n_dims=2)
    rng = np.random.default_rng(8)
    table = jnp.asarray(rng.normal(size=(enc.n_params, enc.F)), jnp.float32)
    x = jnp.asarray(rng.uniform(0, 1, size=(256, 2)), jnp.float32)
    want = enc(table, x)
    got = enc.paired_encode(enc.make_paired_table(table), x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_stochastic_encode_forward_uses_pairs():
    """stochastic_encode's forward must still equal the exact encode."""
    from synerfgine_tpu.nn.hash_encoding import stochastic_encode

    enc = HashEncoding(n_levels=4, n_features_per_level=2,
                       log2_hashmap_size=10, base_resolution=8)
    key = jax.random.PRNGKey(2)
    table = jax.random.normal(key, (enc.n_params, enc.F))
    x = jax.random.uniform(key, (64, 3))
    u = jax.random.uniform(key, (enc.n_levels, 64))
    np.testing.assert_allclose(
        np.asarray(stochastic_encode(enc, table, x, u)),
        np.asarray(enc(table, x)), atol=1e-5, rtol=1e-5)
