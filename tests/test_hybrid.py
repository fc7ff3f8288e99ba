import numpy as np
import jax
import jax.numpy as jnp
import pytest

from synerfgine_tpu.hybrid.scene import (
    Scene, Material, Light, VirtualObject, RenderSettings, load_scene_json,
    LAMBERTIAN, GLOSSY, POINT, DIRECTIONAL,
)
from synerfgine_tpu.hybrid.raytracer import RayTracer, cone_random, smoothstep
from synerfgine_tpu.hybrid.nerf_shadows import box_filter, normals_from_positions
from synerfgine_tpu.grid.occupancy import OccupancyGrid
from synerfgine_tpu.train.nerf_trainer import scene_aabb
from synerfgine_tpu.core.types import Ray
from synerfgine_tpu.render.tonemap import tonemap


VIRTUAL_DESC = "/root/reference/scripts/virtual_desc"


# ------------------------------------------------------------ scene parsing
def test_load_reference_scene_json():
    scene = load_scene_json(f"{VIRTUAL_DESC}/armadillo.json",
                            base_dir="/root/reference/scripts")
    assert len(scene.materials) == 1
    assert scene.materials[0].type == LAMBERTIAN
    assert np.allclose(scene.materials[0].kd, [1.0, 0.0, 0.3])
    assert scene.materials[0].rg == 0.5
    assert len(scene.lights) == 2
    assert scene.lights[0].type == POINT
    assert scene.lights[0].anim_end is not None
    assert scene.lights[1].type == DIRECTIONAL
    assert len(scene.objects) == 1
    assert scene.objects[0].scale == pytest.approx(2.006)
    assert len(scene.objects[0].triangles) > 500
    assert scene.settings.res_factor == 8
    assert scene.settings.path_trace_depth == 2
    assert scene.settings.light_samples == 8
    assert scene.cam_path is not None
    assert scene.cam_path.fps == 24
    assert scene.settings.show_nerf


def test_light_animation_bounces():
    l = Light(0, [0.0, 0.0, 0.0], anim_end=np.array([1.0, 0.0, 0.0], np.float32),
              anim_step=0.5)
    xs = []
    for _ in range(6):
        l.next_frame()
        xs.append(float(l.pos[0]))
    assert max(xs) <= 1.0 and min(xs) >= 0.0
    assert xs[0] == pytest.approx(0.5) and xs[1] == pytest.approx(1.0)
    assert xs[2] == pytest.approx(0.5)  # bounced


def test_object_world_triangles_trs():
    tri = np.array([[[0, 0, 0], [1, 0, 0], [0, 1, 0]]], np.float32)
    vo = VirtualObject(0, tri, pos=np.array([1.0, 2.0, 3.0], np.float32),
                       rot=np.eye(3, dtype=np.float32), scale=2.0, material_id=0)
    w = vo.world_triangles()
    np.testing.assert_allclose(w[0, 1], [3.0, 2.0, 3.0])


# --------------------------------------------------------------- raytracer
def _simple_scene():
    """Floor quad at y=0 + a small blocker quad above it + point light."""
    floor = [[[-2, 0, -2], [2, 0, -2], [2, 0, 2]],
             [[-2, 0, -2], [2, 0, 2], [-2, 0, 2]]]
    blocker = [[[-0.2, 1.0, -0.2], [0.2, 1.0, -0.2], [0.2, 1.0, 0.2]],
               [[-0.2, 1.0, -0.2], [0.2, 1.0, 0.2], [-0.2, 1.0, 0.2]]]
    objs = [
        VirtualObject(0, np.asarray(floor, np.float32), np.zeros(3, np.float32),
                      np.eye(3, dtype=np.float32), 1.0, 0),
        VirtualObject(1, np.asarray(blocker, np.float32), np.zeros(3, np.float32),
                      np.eye(3, dtype=np.float32), 1.0, 0),
    ]
    mats = [Material(0, kd=[0.8, 0.8, 0.8], rg=0.1)]
    lights = [Light(0, [0.0, 2.0, 0.0], intensity=1.0, size=0.0)]
    return Scene(materials=mats, lights=lights, objects=objs)


def test_tracer_shadow_under_blocker():
    scene = _simple_scene()
    world = scene.pack_device()
    grid = OccupancyGrid(1)
    bitfield = jnp.zeros((1, 128, 128, 128), bool)  # empty NeRF
    tracer = RayTracer(grid, scene_aabb(1), samples=1, bounces=1,
                       shadow_samples=1, lens_size=0.0)
    # one ray toward shadowed floor point (0,0,0), one to lit floor (1.5,0,1.5)
    o = jnp.array([[0.0, 0.5, 0.0], [1.5, 0.5, 1.5]])
    d = jnp.array([[0.0, -1.0, 0.0], [0.0, -1.0, 0.0]])
    res = tracer.trace(Ray(o, d), world, bitfield, jax.random.PRNGKey(0))
    assert bool(res.hit[0]) and bool(res.hit[1])
    # blocker at the light-path midpoint => smoothstep(0.5) = 50% shadow
    # (the reference's distance-ratio soft shadow, raytracer.cu:33-35);
    # the lit point has a lower n.l but no shadow mask.
    shadowed = float(jnp.sum(res.rgb[0]))
    lit = float(jnp.sum(res.rgb[1]))
    assert lit > shadowed * 1.2, (lit, shadowed)


def test_tracer_depth_and_gbuffer():
    scene = _simple_scene()
    world = scene.pack_device()
    grid = OccupancyGrid(1)
    bitfield = jnp.zeros((1, 128, 128, 128), bool)
    tracer = RayTracer(grid, scene_aabb(1), samples=1, bounces=1,
                       shadow_samples=1, lens_size=0.0, depth_offset=0.0)
    o = jnp.array([[0.5, 1.0, 0.5]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    res = tracer.trace(Ray(o, d), world, bitfield, jax.random.PRNGKey(1))
    assert float(res.depth[0]) == pytest.approx(1.0, abs=1e-3)
    # floor normal faces up (flipped toward the ray)
    assert float(res.normal[0, 1]) > 0.9
    nv = tracer.buffer_view(res, "Normal")
    assert nv.shape == (1, 3)


def test_tracer_nerf_shadow_on_mesh():
    """An occupied NeRF region between floor and light darkens the floor."""
    scene = _simple_scene()
    scene.objects = scene.objects[:1]  # floor only, no mesh blocker
    world = scene.pack_device()
    grid = OccupancyGrid(1)
    tracer = RayTracer(grid, scene_aabb(1), samples=1, bounces=1,
                       shadow_samples=1, lens_size=0.0, cone_angle=0.0,
                       n_shadow_steps=256)
    o = jnp.array([[0.5, 0.5, 0.5]])
    d = jnp.array([[0.0, -1.0, 0.0]])
    # light at (0,2,0); floor point ~(0.5, 0, 0.5). occupied slab above it:
    bf_empty = jnp.zeros((1, 128, 128, 128), bool)
    bf_slab = bf_empty.at[0, :, 70:85, :].set(True)  # y in ~[0.55, 0.66]
    r_free = tracer.trace(Ray(o, d), world, bf_empty, jax.random.PRNGKey(2))
    r_shad = tracer.trace(Ray(o, d), world, bf_slab, jax.random.PRNGKey(2))
    assert float(jnp.sum(r_shad.rgb)) < float(jnp.sum(r_free.rgb))
    assert float(r_shad.nerf_shadow[0]) < 1.0


def test_cone_random_within_angle():
    axis = jnp.array([[0.0, 0.0, 1.0]] * 100)
    longi = jnp.full(100, 0.3)
    latid = jnp.linspace(0, 2 * np.pi, 100)
    d = cone_random(axis, longi, latid)
    cosang = np.asarray(jnp.sum(d * axis, -1))
    np.testing.assert_allclose(cosang, np.cos(0.3), atol=1e-5)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=-1), 1.0, atol=1e-5)


# ----------------------------------------------------------------- helpers
def test_tonemap_curves():
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 4, (16, 3)).astype(np.float32))
    for curve in ("identity", "aces", "hable", "reinhard"):
        y = tonemap(x, curve)
        assert bool(jnp.all(jnp.isfinite(y)))
        if curve != "identity":
            assert float(jnp.max(y)) <= 2.0  # compresses highlights


def test_box_filter_uniform():
    img = jnp.ones((8, 8))
    out = box_filter(img, 3)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_normals_from_positions_plane():
    # positions on the z=5 plane -> normals along z
    y, x = np.mgrid[0:8, 0:8].astype(np.float32)
    pos = jnp.asarray(np.stack([x, y, np.full_like(x, 5.0)], -1))
    n = normals_from_positions(pos)
    assert abs(float(n[3, 3, 2])) > 0.99
