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


def test_bvh_traverse_pure_and_depth():
    """bvh_traverse over node arrays == brute force; depth bound checked
    at build (the round-1 stack-saturation silent drop is now impossible
    by construction)."""
    import jax.numpy as jnp

    from synerfgine_tpu.geometry.bvh import (
        STACK_DEPTH, TriangleBvh, bvh_traverse)
    from synerfgine_tpu.geometry.triangle import ray_triangles_intersect

    rng = np.random.default_rng(3)
    # ~9k random triangles (above BRUTE_FORCE_MAX_TRIS)
    c = rng.uniform(0, 1, (9000, 1, 3)).astype(np.float32)
    tris = (c + rng.uniform(-0.02, 0.02, (9000, 3, 3))).astype(np.float32)
    bvh = TriangleBvh(tris)
    assert bvh.depth + 1 <= STACK_DEPTH

    o = jnp.asarray(rng.uniform(-0.2, 1.2, (64, 3)).astype(np.float32))
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d = jnp.asarray(d / np.linalg.norm(d, axis=-1, keepdims=True))

    t_b, idx_b, _, _ = bvh_traverse(bvh.node_arrays(), o, d)
    t_f, idx_f, _, _ = ray_triangles_intersect(o, d, bvh.tris)
    np.testing.assert_allclose(np.asarray(t_b), np.asarray(t_f),
                               rtol=1e-5, atol=1e-6)
    hit_b = np.asarray(idx_b) >= 0
    hit_f = np.asarray(idx_f) >= 0
    np.testing.assert_array_equal(hit_b, hit_f)


def test_hybrid_world_routes_through_bvh():
    """pack_device attaches BVH nodes above the threshold and the tracer
    produces the same image as the brute-force path."""
    import jax
    import jax.numpy as jnp

    from synerfgine_tpu.geometry.bvh import BRUTE_FORCE_MAX_TRIS
    from synerfgine_tpu.hybrid.scene import Material, Light, Scene, VirtualObject
    from synerfgine_tpu.hybrid.raytracer import RayTracer
    from synerfgine_tpu.grid.occupancy import OccupancyGrid
    from synerfgine_tpu.train.nerf_trainer import scene_aabb
    from synerfgine_tpu.core.types import Ray

    rng = np.random.default_rng(5)
    n = BRUTE_FORCE_MAX_TRIS + 1000
    c = rng.uniform(0.3, 0.7, (n, 1, 3)).astype(np.float32)
    tris = (c + rng.uniform(-0.01, 0.01, (n, 3, 3))).astype(np.float32)
    obj = VirtualObject(id=0, triangles=tris, pos=np.zeros(3),
                        rot=np.eye(3), scale=1.0, material_id=0)
    scene = Scene(objects=[obj], materials=[Material(0, [0.8, 0.5, 0.2])],
                  lights=[Light(0, [0.5, 2.0, 0.5])])
    world = scene.pack_device()
    assert "bvh_lo" in world

    grid = OccupancyGrid(1)
    aabb = scene_aabb(1)
    bitfield = jnp.zeros((1, 128, 128, 128), bool)
    tracer = RayTracer(grid, aabb, samples=1, bounces=1, shadow_samples=1)
    o = jnp.tile(jnp.asarray([[0.5, 0.5, -1.0]]), (32, 1))
    uv = np.linspace(-0.3, 0.3, 32)
    d = jnp.asarray(np.stack([uv, np.zeros(32), np.ones(32)], -1),
                    jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    res = tracer.trace(Ray(o, d), world, bitfield, jax.random.PRNGKey(0))

    # same scene through the brute-force path (drop bvh keys, same order)
    world_bf = {k: v for k, v in world.items() if not k.startswith("bvh_")}
    res_bf = tracer.trace(Ray(o, d), world_bf, bitfield,
                          jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(res.depth),
                               np.asarray(res_bf.depth), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(res.rgb), np.asarray(res_bf.rgb),
                               atol=1e-4)
