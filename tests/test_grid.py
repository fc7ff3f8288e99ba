import numpy as np
import jax
import jax.numpy as jnp

from synerfgine_tpu.grid.occupancy import (
    OccupancyGrid, mip_from_pos, cascade_cell_of,
)
from synerfgine_tpu.march.dda import (
    to_stepping_space, from_stepping_space, march_rays_grid,
    compact_samples, scatter_back, GridSamples,
)
from synerfgine_tpu.core.types import BoundingBox, Ray
from synerfgine_tpu.core.constants import STEPSIZE, MIN_OPTICAL_THICKNESS
from synerfgine_tpu.train.nerf_trainer import scene_aabb


# ----------------------------------------------------------------- helpers
def test_mip_from_pos():
    pos = jnp.array([
        [0.5, 0.5, 0.5],     # center -> mip 0
        [0.7, 0.5, 0.5],     # maxval 0.2 -> mip 0
        [1.1, 0.5, 0.5],     # maxval 0.6 -> mip 1
        [1.6, 0.5, 0.5],     # maxval 1.1 -> mip 2
        [3.0, 0.5, 0.5],     # maxval 2.5 -> mip 3
    ])
    got = np.asarray(mip_from_pos(pos, 7))
    np.testing.assert_array_equal(got, [0, 0, 1, 2, 3])


def test_cascade_cell_roundtrip():
    # a point at the center of cascade-1 cell must map back to that cell
    pos = jnp.array([[0.3, 0.9, 0.1]])
    mip = jnp.array([1])
    cell = np.asarray(cascade_cell_of(pos, mip))[0]
    # cascade 1 covers [-0.5, 1.5]; relative = (pos-0.5)/2+0.5
    rel = (np.array([0.3, 0.9, 0.1]) - 0.5) / 2 + 0.5
    np.testing.assert_array_equal(cell, np.floor(rel * 128).astype(int))


# ------------------------------------------------------------ grid update
def test_grid_update_marks_occupied_region():
    grid = OccupancyGrid(aabb_scale=1)
    state = grid.init()
    aabb = scene_aabb(1)

    # density: a ball at center is dense, elsewhere empty
    def density_fn(xs):
        d = jnp.linalg.norm(xs - 0.5, axis=-1)
        return jnp.where(d < 0.2, 5.0, -10.0)  # raw (pre-exp)

    key = jax.random.PRNGKey(0)
    for i in range(3):
        key, k = jax.random.split(key)
        state = grid.update(state, density_fn, aabb, k, 128**3, 0)

    bf = np.asarray(state.bitfield[0])
    G = 128
    c = G // 2
    assert bf[c, c, c]                      # center occupied
    assert not bf[5, 5, 5]                  # corner empty
    occ_frac = bf.mean()
    assert 0.005 < occ_frac < 0.2           # ~ball volume fraction


def test_grid_ema_decay_and_culling():
    grid = OccupancyGrid(aabb_scale=1)
    state = grid.init()
    # culled cells (-1) stay culled through updates
    density = state.density.at[0, 0, 0, 0].set(-1.0)
    density = density.at[0, 64, 64, 64].set(1.0)
    state = state._replace(density=density)
    aabb = scene_aabb(1)
    zero_fn = lambda xs: jnp.full(xs.shape[:1], -30.0)
    state = grid.update(state, zero_fn, aabb, jax.random.PRNGKey(1), 4096, 0)
    d = np.asarray(state.density)
    assert d[0, 0, 0, 0] == -1.0
    # decay-max: high value decays by 0.95 per update (unless resampled)
    assert d[0, 64, 64, 64] <= 1.0


def test_bitfield_threshold_and_maxpool():
    grid = OccupancyGrid(aabb_scale=2)  # 2 cascades
    state = grid.init()
    density = jnp.zeros_like(state.density)
    # one hot cell in cascade 0 at (10, 20, 30)
    density = density.at[0, 10, 20, 30].set(1.0)
    state = grid.finalize(state._replace(density=density))
    bf = np.asarray(state.bitfield)
    assert bf[0, 10, 20, 30]
    assert bf[0].sum() == 1
    # max-pooled into cascade 1 central block: (10//2+32, 20//2+32, 30//2+32)
    assert bf[1, 37, 42, 47]
    assert bf[1].sum() == 1
    # threshold respects min(mean, 0.01): mean here ~ tiny -> thresh=mean
    assert np.isclose(float(state.mean_density), 1.0 / 128**3, rtol=1e-3)


def test_mark_untrained_culls_invisible():
    grid = OccupancyGrid(aabb_scale=1)
    state = grid.init()
    # single camera at z=-1 looking at the center: cells far behind the
    # camera never project -> culled
    from synerfgine_tpu.core.camera import look_at

    xf = jnp.asarray(look_at([0.5, 0.5, -1.0], [0.5, 0.5, 0.5]))[None]
    state = grid.mark_untrained(state, xf, (100, 100), (120.0, 120.0))
    d = np.asarray(state.density[0])
    assert d[64, 64, 64] >= 0.0      # center visible
    # cell behind the camera (z < -1 is outside cascade 0 anyway; use z~0
    # but far off-axis)
    assert d[0, 64, 0] < 0.0         # off-frustum corner culled
    # some culling must happen, but most of the cube is visible
    frac = (d >= 0).mean()
    assert 0.05 < frac < 1.0


def test_mark_sphere_empty():
    grid = OccupancyGrid(aabb_scale=1)
    state = grid.init()
    state = state._replace(density=jnp.ones_like(state.density))
    state = grid.mark_sphere_empty(state, (0.5, 0.5, 0.5), 0.1)
    d = np.asarray(state.density[0])
    assert d[64, 64, 64] == -1.0
    assert d[5, 5, 5] == 1.0


# -------------------------------------------------------- stepping space
def test_stepping_space_uniform():
    t = jnp.array([0.1, 0.5, 1.0])
    n = to_stepping_space(t, 0.0)
    np.testing.assert_allclose(np.asarray(n), np.asarray(t) / STEPSIZE, rtol=1e-6)
    t2 = from_stepping_space(n, 0.0)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-6)


def test_stepping_space_cone_roundtrip():
    cone = 1.0 / 256.0
    t = jnp.array([1e-3, 0.01, 0.1, 1.0, 10.0, 100.0])
    n = to_stepping_space(t, cone)
    t2 = from_stepping_space(n, cone)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(t), rtol=1e-4)
    # dt grows with t in the log region
    dts = np.asarray(from_stepping_space(n + 1, cone) - t)
    assert dts[3] > dts[1]


def test_stepping_space_reference_regimes():
    """The three regimes of the reference's exponential stepping
    (nerf_device.cuh:379-430) at cone_angle = 1/256:
    dt == STEPSIZE near the camera, dt ~= t * cone in the log region, and
    dt saturates at MAX_CONE_STEPSIZE() = STEPSIZE * 2^(CASCADES-1) *
    STEPS / GRIDSIZE = sqrt(3) (nerf_device.cuh:36) far away — NOT at
    STEPSIZE (the round-1 bug that made far geometry unreachable)."""
    from synerfgine_tpu.core.constants import (
        MAX_CONE_STEPSIZE, NERF_CASCADES, NERF_GRIDSIZE, NERF_STEPS)

    assert MAX_CONE_STEPSIZE == STEPSIZE * (1 << (NERF_CASCADES - 1)) \
        * NERF_STEPS / NERF_GRIDSIZE
    np.testing.assert_allclose(MAX_CONE_STEPSIZE, np.sqrt(3.0), rtol=1e-6)

    cone = 1.0 / 256.0

    def dt_at(t):
        n = to_stepping_space(jnp.float32(t), cone)
        return float(from_stepping_space(n + 1.0, cone)
                     - from_stepping_space(n, cone))

    # near regime: min step
    np.testing.assert_allclose(dt_at(0.01), STEPSIZE, rtol=1e-3)
    # log regime: dt ~= t * log(1+cone) ~= t * cone (fp32 exp/log slop)
    np.testing.assert_allclose(dt_at(10.0), 10.0 * np.log1p(cone), rtol=1e-2)
    # far regime: saturated at MAX_CONE_STEPSIZE; 1024 steps from the
    # camera now reach t ~= 8.7 (the reference's behavior) instead of
    # ~1.7 with the collapsed constant
    np.testing.assert_allclose(dt_at(2000.0), MAX_CONE_STEPSIZE, rtol=1e-3)
    span = float(from_stepping_space(to_stepping_space(
        jnp.float32(1e-4), cone) + 1024.0, cone))
    assert span > 5.0


def test_mip_from_dt():
    """mip_from_dt (nerf_device.cuh:450-460): returns mip_from_pos while
    dt*2*G < 1, else at least the exponent of dt*2*G."""
    from synerfgine_tpu.grid.occupancy import mip_from_dt, mip_from_pos

    pos = jnp.array([[0.5, 0.5, 0.6],      # mip 0 cell
                     [0.5, 0.5, 4.0]])     # far: mip_from_pos = 3
    base = np.asarray(mip_from_pos(pos, 7))
    # tiny dt: unchanged
    m = np.asarray(mip_from_dt(jnp.full((2,), STEPSIZE), pos, 7))
    np.testing.assert_array_equal(m, base)
    # big dt = 0.1: dt*2*128 = 25.6 -> frexp exponent 5 -> at least 5
    m = np.asarray(mip_from_dt(jnp.full((2,), 0.1), pos, 7))
    assert m[0] == 5 and m[1] == 5
    # dt-mip never decreases below the pos mip
    m = np.asarray(mip_from_dt(jnp.full((2,), 0.01), pos, 7))
    assert m[1] >= base[1]


# ------------------------------------------------------------- marching
def test_march_full_bitfield_hits_everything():
    grid = OccupancyGrid(aabb_scale=1)
    bitfield = jnp.ones((1, 128, 128, 128), bool)
    aabb = scene_aabb(1)
    o = jnp.array([[0.5, 0.5, -0.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    s = march_rays_grid(Ray(o, d), aabb, grid, bitfield, 1024, 0.0)
    # ray crosses the unit cube: 1.0 of path at dt = sqrt(3)/1024
    n_valid = int(jnp.sum(s.valid))
    expect = int(1.0 / STEPSIZE)
    assert abs(n_valid - expect) <= 2
    assert bool(jnp.all(s.t[0, 1:] > s.t[0, :-1]))  # monotone


def test_march_empty_bitfield_hits_nothing():
    grid = OccupancyGrid(aabb_scale=1)
    bitfield = jnp.zeros((1, 128, 128, 128), bool)
    aabb = scene_aabb(1)
    o = jnp.array([[0.5, 0.5, -0.5]])
    d = jnp.array([[0.0, 0.0, 1.0]])
    s = march_rays_grid(Ray(o, d), aabb, grid, bitfield, 256, 0.0)
    assert int(jnp.sum(s.valid)) == 0


def test_compaction_roundtrip():
    R, K, S = 4, 16, 32
    rng = np.random.default_rng(3)
    valid = jnp.asarray(rng.random((R, K)) < 0.4)
    xs = jnp.asarray(rng.normal(size=(R, K, 3)).astype(np.float32))
    t = jnp.asarray(np.cumsum(rng.random((R, K)), 1).astype(np.float32))
    dt = jnp.full((R, K), 0.01)
    samples = GridSamples(t=t, dt=dt, xs=xs, valid=valid)
    dirs = jnp.asarray(rng.normal(size=(R, 3)).astype(np.float32))
    comp = compact_samples(samples, dirs, S)
    n_valid = int(comp.n_valid)
    assert n_valid == int(jnp.sum(valid))
    # compacted xs are exactly the valid xs in row-major order
    want = np.asarray(xs)[np.asarray(valid)]
    np.testing.assert_allclose(np.asarray(comp.xs[:n_valid]), want, atol=1e-6)
    # scatter_back returns values to their (R, K) slots
    out = jnp.concatenate([comp.xs, jnp.zeros((comp.xs.shape[0], 1))], -1)
    dense = scatter_back(out, comp, R, K)
    np.testing.assert_allclose(
        np.asarray(dense[..., :3])[np.asarray(comp.valid)], want, atol=1e-6
    )
    # dirs broadcast: every compacted sample carries its ray's dir
    row_of = np.repeat(np.arange(R), K).reshape(R, K)[np.asarray(valid)]
    np.testing.assert_allclose(np.asarray(comp.dirs[:n_valid]),
                               np.asarray(dirs)[row_of], atol=1e-6)


def test_compaction_overflow_clips():
    R, K, S = 2, 8, 5
    valid = jnp.ones((R, K), bool)
    samples = GridSamples(
        t=jnp.ones((R, K)), dt=jnp.ones((R, K)),
        xs=jnp.ones((R, K, 3)), valid=valid,
    )
    comp = compact_samples(samples, jnp.ones((R, 3)), S)
    assert int(comp.n_valid) == 16          # pre-clip count (feedback signal)
    assert int(jnp.sum(comp.valid)) == S    # post-clip capacity
