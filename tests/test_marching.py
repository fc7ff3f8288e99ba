import numpy as np

from synerfgine_tpu.geometry.marching import marching_tetrahedra, save_mesh_obj
from synerfgine_tpu.geometry.obj import load_obj


def _sphere_field(n=48, r=0.35):
    g = np.linspace(0, 1, n, dtype=np.float32)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return r - np.sqrt((x - 0.5) ** 2 + (y - 0.5) ** 2 + (z - 0.5) ** 2)


def test_marching_tetrahedra_sphere():
    n = 48
    field = _sphere_field(n)
    sp = 1.0 / (n - 1)
    verts, faces = marching_tetrahedra(field, 0.0, spacing=(sp, sp, sp))
    assert len(verts) > 100 and len(faces) > 100
    # all vertices ~ on the sphere of radius 0.35
    d = np.linalg.norm(verts - 0.5, axis=-1)
    assert np.abs(d - 0.35).max() < 0.03
    # surface area close to 4*pi*r^2
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(b - a, c - a), axis=-1).sum()
    assert abs(area - 4 * np.pi * 0.35**2) / (4 * np.pi * 0.35**2) < 0.05
    # normals point outward (away from center)
    n_vec = np.cross(b - a, c - a)
    centroid = (a + b + c) / 3 - 0.5
    outward = (n_vec * centroid).sum(-1) > 0
    assert outward.mean() > 0.99


def test_marching_empty_field():
    verts, faces = marching_tetrahedra(np.zeros((8, 8, 8), np.float32), 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_save_mesh_obj_roundtrip(tmp_path):
    field = _sphere_field(16)
    verts, faces = marching_tetrahedra(field, 0.0)
    p = str(tmp_path / "m.obj")
    save_mesh_obj(p, verts, faces, colors=np.ones((len(verts), 3), np.float32) * 0.5)
    tris = load_obj(p)
    assert len(tris) == len(faces)


def test_mesh_optimization_moves_to_isosurface():
    import jax.numpy as jnp

    from synerfgine_tpu.geometry.mesh_opt import optimize_mesh

    # analytic field: radius function; isosurface at r = 0.35
    def field(p):
        return 0.35 - jnp.linalg.norm(p - 0.5, axis=-1)

    # start from a slightly wrong sphere mesh (r = 0.30)
    n = 24
    f = _sphere_field(n, r=0.30)
    sp = 1.0 / (n - 1)
    verts, faces = marching_tetrahedra(f, 0.0, spacing=(sp, sp, sp))
    r_before = np.abs(np.linalg.norm(verts - 0.5, axis=-1) - 0.35).mean()
    out = optimize_mesh(field, verts, faces, threshold=0.0, n_steps=200,
                        lr=2e-3, smooth_lambda=0.05)
    r_after = np.abs(np.linalg.norm(out - 0.5, axis=-1) - 0.35).mean()
    assert r_after < r_before * 0.5, (r_before, r_after)
