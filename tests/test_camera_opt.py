import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.train.camera_opt import (
    CameraOptParams, init_camera_opt, apply_camera_opt, camera_opt_update,
)
from synerfgine_tpu.data import load_nerf_dataset
from synerfgine_tpu.train.nerf_trainer import NerfTrainer
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


def test_apply_camera_opt_identity():
    xforms = jnp.asarray(np.random.default_rng(0).normal(size=(3, 3, 4)),
                         jnp.float32)
    st = init_camera_opt(3)
    idx = jnp.array([0, 2, 1, 0])
    out = apply_camera_opt(xforms, st.params, idx)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xforms[idx]),
                               atol=1e-6)


def test_apply_camera_opt_translation():
    xforms = jnp.tile(jnp.eye(3, 4)[None], (2, 1, 1))
    st = init_camera_opt(2)
    p = st.params._replace(trans=jnp.asarray([[0.1, 0.0, 0.0], [0.0, 0.2, 0.0]]))
    out = apply_camera_opt(xforms, p, jnp.array([0, 1]))
    assert np.isclose(float(out[0, 0, 3]), 0.1)
    assert np.isclose(float(out[1, 1, 3]), 0.2)


def test_camera_opt_adam_descends_quadratic():
    st = init_camera_opt(4)
    target = jnp.asarray(np.random.default_rng(1).normal(size=(4, 3)) * 0.05,
                         jnp.float32)
    for _ in range(400):
        g = CameraOptParams(
            rot=2 * (st.params.rot - target),
            trans=jnp.zeros_like(st.params.trans),
            exposure=jnp.zeros_like(st.params.exposure),
        )
        st = camera_opt_update(st, g, lr_rot=5e-3)
    np.testing.assert_allclose(np.asarray(st.params.rot), np.asarray(target),
                               atol=5e-3)


def test_trainer_with_camera_opt_runs(lego_dir):
    ds = load_nerf_dataset(lego_dir, max_images=3, downscale=16)
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    tr = NerfTrainer(NerfNetwork(cfg), ds, n_rays=64, n_march_steps=32,
                     batch_size=512, use_grid=True, grid_warmup_steps=1,
                     grid_update_cadence=4, optimize_extrinsics=True,
                     optimize_exposure=True)
    state = tr.init(jax.random.PRNGKey(0))
    assert state.cam_opt is not None
    for _ in range(6):
        state, loss = tr.step(state)
    assert np.isfinite(float(loss))
    # camera params moved (gradients flowed through pose)
    assert float(jnp.max(jnp.abs(state.cam_opt.params.trans))) > 0
    assert float(jnp.max(jnp.abs(state.cam_opt.params.exposure))) > 0
