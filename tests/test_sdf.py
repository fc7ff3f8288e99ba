import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.train.sdf_trainer import (
    SdfModel, SdfTrainer, point_triangle_distance, inside_sign, signed_distance,
)
from synerfgine_tpu.core.config import NGPNetworkConfig, HashGridConfig, MLPConfig
from synerfgine_tpu.core.camera import look_at


def _cube_tris(lo=0.4, hi=0.6):
    """Axis-aligned cube as 12 triangles."""
    v = np.array([[x, y, z] for x in (lo, hi) for y in (lo, hi) for z in (lo, hi)],
                 np.float32)
    # faces (two tris each): -x, +x, -y, +y, -z, +z
    quads = [
        (0, 1, 3, 2), (4, 6, 7, 5),
        (0, 4, 5, 1), (2, 3, 7, 6),
        (0, 2, 6, 4), (1, 5, 7, 3),
    ]
    tris = []
    for a, b, c, d in quads:
        tris.append([v[a], v[b], v[c]])
        tris.append([v[a], v[c], v[d]])
    return np.asarray(tris, np.float32)


def test_point_triangle_distance():
    tris = jnp.asarray([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], jnp.float32)
    p = jnp.array([[0.25, 0.25, 0.5], [2.0, 0.0, 0.0], [-1.0, -1.0, 0.0]])
    d = np.asarray(point_triangle_distance(p, tris))
    assert np.isclose(d[0], 0.5, atol=1e-5)        # above interior
    assert np.isclose(d[1], 1.0, atol=1e-5)        # beyond vertex (1,0,0)
    assert np.isclose(d[2], np.sqrt(2), atol=1e-5)  # beyond vertex (0,0,0)


def test_signed_distance_cube():
    tris = jnp.asarray(_cube_tris())
    p = jnp.array([[0.5, 0.5, 0.5],      # center: inside, dist 0.1
                   [0.5, 0.5, 0.8],      # outside by 0.2
                   [0.45, 0.5, 0.5]])    # inside, dist 0.05
    sd = np.asarray(signed_distance(p, tris))
    assert np.isclose(sd[0], -0.1, atol=1e-4)
    assert np.isclose(sd[1], 0.2, atol=1e-4)
    assert np.isclose(sd[2], -0.05, atol=1e-4)


def _tiny_model():
    return SdfModel(NGPNetworkConfig(
        encoding=HashGridConfig(n_levels=6, n_features_per_level=2,
                                log2_hashmap_size=14, base_resolution=8,
                                per_level_scale=1.6),
        network=MLPConfig(n_neurons=32, n_hidden_layers=2),
    ))


def test_sdf_training_and_iou():
    tris = _cube_tris(0.3, 0.7)
    model = _tiny_model()
    tr = SdfTrainer(model, tris, batch_size=4096)
    state = tr.init(jax.random.PRNGKey(0))
    losses = []
    for _ in range(120):
        state, loss = tr.step(state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2
    iou = tr.iou(state, resolution=32)
    assert iou > 0.7, iou


def test_sdf_render_smoke():
    tris = _cube_tris(0.35, 0.65)
    model = _tiny_model()
    tr = SdfTrainer(model, tris, batch_size=2048)
    state = tr.init(jax.random.PRNGKey(1))
    for _ in range(60):
        state, _ = tr.step(state)
    camera = look_at([0.5, 0.6, -0.8], [0.5, 0.5, 0.5])
    out = tr.render(state, camera, width=48, height=48, n_iters=48)
    assert out["rgb"].shape == (48, 48, 3)
    assert np.isfinite(out["rgb"]).all()
    assert out["hit"].sum() > 50   # the cube is visible


def test_sdf_takikawa_training():
    tris = _cube_tris(0.3, 0.7)
    model = _tiny_model()
    tr = SdfTrainer(model, tris, batch_size=2048, use_takikawa=True)
    state = tr.init(jax.random.PRNGKey(2))
    losses = []
    for _ in range(60):
        state, loss = tr.step(state)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
