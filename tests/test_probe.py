import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.hybrid.probe import LightProbe
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.train.nerf_trainer import scene_aabb
from synerfgine_tpu.nn.nerf_network import NerfNetwork
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig


def test_probe_directions_cover_sphere():
    p = LightProbe(16, 32)
    d = np.asarray(p.directions())
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
    # up/down/equator all represented
    assert d[:, 1].max() > 0.98 and d[:, 1].min() < -0.98


def test_probe_capture_and_sample():
    cfg = NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=3, n_features_per_level=2,
                                log2_hashmap_size=10, base_resolution=4,
                                per_level_scale=2.0),
        network=MLPConfig(n_neurons=16, n_hidden_layers=1),
        rgb_network=MLPConfig(n_neurons=16, n_hidden_layers=1),
    )
    net = NerfNetwork(cfg)
    params = net.init(jax.random.PRNGKey(0))
    grid = OccupancyGrid(1)
    gstate = grid.init()
    # occupy a ball so some probe rays hit
    c = grid.cell_centers(0).reshape(128, 128, 128, 3)
    density = gstate.density.at[0].set(
        jnp.where(jnp.linalg.norm(c - 0.5, axis=-1) < 0.2, 1.0, 0.0))
    gstate = grid.finalize(gstate._replace(density=density))

    probe = LightProbe(8, 16)
    # step budget must cover the distance to the ball: 384 * sqrt(3)/1024
    # ~ 0.65 > 0.2 (near side)
    m = probe.capture(net, params, grid, gstate, scene_aabb(1),
                      center=(0.5, 0.5, 0.1), n_steps=384)
    assert m.shape == (8, 16, 4)
    assert np.isfinite(np.asarray(m)).all()
    assert float(m[..., 3].max()) > 0.1  # something was captured
    s = probe.sample(jnp.array([[0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]))
    assert s.shape == (2, 4)
