import numpy as np
import jax.numpy as jnp
import pytest

from synerfgine_tpu.geometry import load_obj, ray_triangles_intersect, TriangleBvh
from synerfgine_tpu.geometry.triangle import ray_triangles_any_hit, triangle_normals


OBJ_DIR = "/root/reference/data/obj"


def test_load_obj_box():
    tris = load_obj(f"{OBJ_DIR}/box.obj")
    assert tris.shape[1:] == (3, 3)
    assert len(tris) >= 12  # a box is at least 12 tris


def test_load_obj_armadillo():
    tris = load_obj(f"{OBJ_DIR}/armadillo.obj")
    assert len(tris) > 500
    assert np.isfinite(tris).all()


def _unit_quad_tris():
    # two triangles forming the z=0 square [0,1]^2
    return jnp.asarray([
        [[0, 0, 0], [1, 0, 0], [1, 1, 0]],
        [[0, 0, 0], [1, 1, 0], [0, 1, 0]],
    ], jnp.float32)


def test_ray_triangle_hit_miss():
    tris = _unit_quad_tris()
    o = jnp.array([[0.5, 0.5, -1.0], [2.0, 2.0, -1.0], [0.5, 0.5, 1.0]])
    d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
    t, idx, u, v = ray_triangles_intersect(o, d, tris)
    assert np.isclose(float(t[0]), 1.0)
    assert int(idx[0]) >= 0
    assert int(idx[1]) == -1  # miss
    assert int(idx[2]) == -1  # behind
    any_hit = ray_triangles_any_hit(o, d, tris)
    assert bool(any_hit[0]) and not bool(any_hit[1])


def test_triangle_normals_unit():
    n = triangle_normals(_unit_quad_tris())
    np.testing.assert_allclose(np.abs(np.asarray(n[:, 2])), 1.0, atol=1e-6)


def test_bvh_matches_bruteforce():
    tris_np = load_obj(f"{OBJ_DIR}/armadillo.obj")
    bvh = TriangleBvh(tris_np)
    rng = np.random.default_rng(5)
    # rays toward the mesh from outside
    center = tris_np.reshape(-1, 3).mean(0)
    o = jnp.asarray(center + rng.normal(size=(64, 3)) * 2.0, jnp.float32)
    d = jnp.asarray(center - np.asarray(o), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    t_brute, idx_brute, _, _ = ray_triangles_intersect(o, d, bvh.tris)
    t_bvh, idx_bvh, _, _ = bvh._traverse(o, d)
    hit_b = np.asarray(idx_brute) >= 0
    hit_v = np.asarray(idx_bvh) >= 0
    np.testing.assert_array_equal(hit_b, hit_v)
    np.testing.assert_allclose(
        np.asarray(t_brute)[hit_b], np.asarray(t_bvh)[hit_v], rtol=1e-4
    )
    assert hit_b.sum() > 32  # most rays aimed at the mesh hit


def test_bvh_structure():
    tris = load_obj(f"{OBJ_DIR}/monkey.obj")
    bvh = TriangleBvh(tris)
    assert bvh.n_tris == len(tris)
    left = np.asarray(bvh.left)
    count = np.asarray(bvh.count)
    leaves = left < 0
    assert count[leaves].sum() == len(tris)
    assert count[leaves].max() <= 4
