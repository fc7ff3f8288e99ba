import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.train.volume_trainer import VolumeModel, VolumeTrainer
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig
from synerfgine_tpu.core.camera import look_at


def _smoke_volume(n=32):
    g = np.linspace(0, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    r = np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)
    return np.maximum(0.0, 1.0 - r / 0.35) * 20.0


def _model():
    return VolumeModel(NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=5, n_features_per_level=2,
                                log2_hashmap_size=13, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=32, n_hidden_layers=1),
    ))


def test_volume_fit_descends():
    tr = VolumeTrainer(_model(), _smoke_volume(), batch_size=4096)
    state = tr.init(jax.random.PRNGKey(0))
    losses = []
    for _ in range(80):
        state, loss = tr.step(state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3
    assert tr.field_mse(state) < 0.3


def test_volume_render_smoke():
    tr = VolumeTrainer(_model(), _smoke_volume(), batch_size=2048)
    state = tr.init(jax.random.PRNGKey(1))
    for _ in range(40):
        state, _ = tr.step(state)
    camera = look_at([0.5, 0.5, -1.2], [0.5, 0.5, 0.5])
    out = tr.render(state, camera, width=32, height=32, n_steps=64)
    assert out["rgb"].shape == (32, 32, 3)
    assert np.isfinite(out["rgb"]).all()
    # the smoke ball occludes the center: alpha there > edges
    assert out["alpha"][16, 16] > out["alpha"][1, 1] + 0.1


def test_volume_gt_sampling_trilinear():
    vol = np.zeros((4, 4, 4), np.float32)
    vol[2, 2, 2] = 8.0
    tr = VolumeTrainer(_model(), vol, batch_size=64)
    # at the exact voxel position the value is recovered
    x = jnp.asarray([[2 / 3, 2 / 3, 2 / 3]])
    v = float(tr.sample_gt(x)[0])
    assert abs(v - 8.0) < 1e-4
