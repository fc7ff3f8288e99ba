import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.core import morton, camera, se3
from synerfgine_tpu.core.types import BoundingBox


def test_morton_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.integers(0, 128, size=(1000, 3)).astype(np.uint32)
    code = morton.morton3(jnp.asarray(xyz[:, 0]), jnp.asarray(xyz[:, 1]), jnp.asarray(xyz[:, 2]))
    x, y, z = morton.inv_morton3(code)
    np.testing.assert_array_equal(np.asarray(x), xyz[:, 0])
    np.testing.assert_array_equal(np.asarray(y), xyz[:, 1])
    np.testing.assert_array_equal(np.asarray(z), xyz[:, 2])


def test_morton_locality():
    # children of a coarse voxel are 8 consecutive codes
    c0 = morton.morton3(jnp.array([4]), jnp.array([6]), jnp.array([2]))
    codes = []
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                codes.append(
                    int(morton.morton3(jnp.array([8 + dx]), jnp.array([12 + dy]), jnp.array([4 + dz]))[0])
                )
    codes = sorted(codes)
    assert codes == list(range(codes[0], codes[0] + 8))
    assert codes[0] == int(c0[0]) * 8


def test_ngp_matrix_roundtrip():
    rng = np.random.default_rng(1)
    # random orthonormal rotation + translation
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    R = np.asarray(se3.quat_to_matrix(jnp.asarray(q)))
    m = np.concatenate([R, rng.normal(size=(3, 1))], axis=1).astype(np.float32)
    ngp = camera.nerf_matrix_to_ngp(m)
    back = camera.ngp_matrix_to_nerf(ngp)
    np.testing.assert_allclose(back, m, atol=1e-6)


def test_uv_ray_project_roundtrip():
    cam = jnp.asarray(camera.look_at([0.5, 0.5, -1.5], [0.5, 0.5, 0.5]))
    uv = jnp.array([[0.3, 0.7], [0.5, 0.5], [0.9, 0.1]])
    rays = camera.uv_to_ray(uv, cam, (800, 800), (1000.0, 1000.0))
    pos = rays.at(jnp.array([1.7, 2.0, 1.1]))
    uv_back = camera.pos_to_uv(pos, cam, (800, 800), (1000.0, 1000.0))
    np.testing.assert_allclose(np.asarray(uv_back), np.asarray(uv), atol=1e-5)


def test_aabb_intersect():
    box = BoundingBox(jnp.zeros(3), jnp.ones(3))
    o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, 2.0], [0.5, 0.5, 0.5]])
    d = jnp.array([[0.0, 0.0, 1.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    tmin, tmax = box.ray_intersect(o, d)
    assert tmin[0] == 1.0 and tmax[0] == 2.0
    assert tmin[1] > tmax[1]  # miss
    assert tmin[2] <= 0.0 and np.isclose(tmax[2], 0.5)


def test_se3_roundtrips():
    rng = np.random.default_rng(2)
    aa = jnp.asarray(rng.normal(size=(10, 3)) * 0.8)
    R = se3.axis_angle_to_matrix(aa)
    aa2 = se3.matrix_to_axis_angle(R)
    np.testing.assert_allclose(np.asarray(aa2), np.asarray(aa), atol=1e-5)
    q = se3.matrix_to_quat(R)
    R2 = se3.quat_to_matrix(q)
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)


def test_config_per_level_scale():
    from synerfgine_tpu.core.config import NGPNetworkConfig

    cfg = NGPNetworkConfig.from_json("/root/reference/configs/nerf/base.json")
    assert cfg.encoding.n_levels == 8
    assert cfg.encoding.n_features_per_level == 4
    assert cfg.encoding.log2_hashmap_size == 19
    # derived: (2048*1/16)^(1/7) = 2.0
    assert abs(cfg.encoding.resolve_per_level_scale(1) - 2.0) < 1e-9
    assert cfg.optimizer.adam.epsilon == 1e-15
    assert cfg.optimizer.ema_decay == 0.95
    assert cfg.optimizer.decay.decay_start == 20000
    assert cfg.loss == "huber"
    assert cfg.rgb_network.n_hidden_layers == 2
