"""Native C++ geometry runtime vs. the numpy oracles."""
import numpy as np
import pytest

from synerfgine_tpu.geometry import native
from synerfgine_tpu.geometry.obj import _load_obj_py
from synerfgine_tpu.geometry.bvh import TriangleBvh

OBJ = "/root/reference/data/obj/armadillo.obj"


pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built")


def test_native_obj_matches_python():
    a = native.load_obj_native(OBJ)
    b = _load_obj_py(OBJ)
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_native_bvh_structure_valid():
    tris = _load_obj_py(OBJ)
    nb = native.bvh_build_native(tris, 4)
    left = nb["left"]
    count = nb["count"]
    leaves = left < 0
    assert count[leaves].sum() == len(tris)
    assert count[leaves].max() <= 4
    # every triangle appears exactly once in the reorder
    assert sorted(nb["order"].tolist()) == list(range(len(tris)))
    # child bounds nest inside parents
    inner = ~leaves
    li = left[inner]
    np.testing.assert_array_less(nb["lo"][inner] - 1e-5, nb["lo"][li] + 1e-4)


def test_native_bvh_traversal_matches_bruteforce():
    import jax.numpy as jnp

    from synerfgine_tpu.geometry.triangle import ray_triangles_intersect

    tris = _load_obj_py(OBJ)
    bvh = TriangleBvh(tris, use_native=True)
    rng = np.random.default_rng(9)
    center = tris.reshape(-1, 3).mean(0)
    o = jnp.asarray(center + rng.normal(size=(32, 3)) * 2.0, jnp.float32)
    d = jnp.asarray(center - np.asarray(o), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t_b, idx_b, _, _ = ray_triangles_intersect(o, d, bvh.tris)
    t_v, idx_v, _, _ = bvh._traverse(o, d)
    hit_b = np.asarray(idx_b) >= 0
    np.testing.assert_array_equal(hit_b, np.asarray(idx_v) >= 0)
    np.testing.assert_allclose(np.asarray(t_b)[hit_b], np.asarray(t_v)[hit_b],
                               rtol=1e-4)
