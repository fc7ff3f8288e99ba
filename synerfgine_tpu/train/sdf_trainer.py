"""SDF mode: neural signed-distance fields from meshes.

Capability match for the reference's SDF testbed (src/testbed_sdf.cu, N16
in SURVEY.md §2): online training data from mesh-surface samples with
BVH-computed signed distances, hash-encoding + MLP distance regression,
sphere-traced rendering with shadow rays and simple BRDF shading, and IoU
evaluation against the ground-truth mesh (`calculate_iou`,
testbed.cu:3458-3461).

TPU notes: signed distance of sample batches is computed by a dense
(N, T) point-triangle distance (exact) with parity-count sign (a ray-stab
along +x, matching the reference's raystab strategy for non-watertight
meshes it uses mode `Raystab`); sphere tracing is a fixed-iteration
masked loop (lax-friendly static shapes).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import NGPNetworkConfig
from ..core.types import Ray
from ..nn.hash_encoding import HashEncoding
from ..nn.mlp import MLP
from ..nn.optimizers import NGPOptimizer, NGPOptState


# ------------------------------------------------------- geometry helpers
def point_triangle_distance(p: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """Unsigned distance from points (N, 3) to closest of (T, 3, 3).

    Exact closest-point-on-triangle (Ericson, Real-Time Collision
    Detection 5.1.5), vectorized over the (N, T) pair grid with
    priority-ordered region selects."""
    a, b, c = tris[:, 0][None], tris[:, 1][None], tris[:, 2][None]  # (1,T,3)
    ab = b - a
    ac = c - a
    pp = p[:, None, :]
    ap = pp - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = pp - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = pp - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    def safe(x, y):
        return x / jnp.where(jnp.abs(y) < 1e-20, 1e-20, y)

    # interior (default)
    denom = va + vb + vc
    v_in = safe(vb, denom)
    w_in = safe(vc, denom)
    q = a + v_in[..., None] * ab + w_in[..., None] * ac
    # edge bc region
    t_bc = safe(d4 - d3, (d4 - d3) + (d5 - d6))
    cond_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    q = jnp.where(cond_bc[..., None], b + t_bc[..., None] * (c - b), q)
    # edge ac region
    t_ac = safe(d2, d2 - d6)
    cond_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    q = jnp.where(cond_ac[..., None], a + t_ac[..., None] * ac, q)
    # edge ab region
    t_ab = safe(d1, d1 - d3)
    cond_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    q = jnp.where(cond_ab[..., None], a + t_ab[..., None] * ab, q)
    # vertex regions (highest priority)
    q = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c, q)
    q = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b, q)
    q = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a, q)

    d = jnp.linalg.norm(pp - q, axis=-1)
    return jnp.min(d, axis=1)


def inside_sign(p: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """-1 inside / +1 outside via ray-parity (watertight assumption).
    The stab direction is slightly irrational to dodge edge/vertex
    double-count degeneracies on axis-aligned geometry."""
    d = jnp.broadcast_to(jnp.asarray([0.99999934, 3.271e-4, 7.537e-4]), p.shape)
    v0 = tris[:, 0]
    e1 = tris[:, 1] - v0
    e2 = tris[:, 2] - v0
    pvec = jnp.cross(d[:, None, :], e2[None])
    det = jnp.sum(pvec * e1[None], -1)
    inv = jnp.where(jnp.abs(det) < 1e-12, 0.0, 1.0 / det)
    tvec = p[:, None, :] - v0[None]
    u = jnp.sum(tvec * pvec, -1) * inv
    qvec = jnp.cross(tvec, e1[None])
    v = jnp.sum(qvec * d[:, None, :], -1) * inv
    t = jnp.sum(qvec * e2[None], -1) * inv
    hits = ((jnp.abs(det) >= 1e-12) & (u >= 0) & (v >= 0)
            & (u + v <= 1) & (t > 1e-9))
    parity = jnp.sum(hits, -1) % 2
    return jnp.where(parity == 1, -1.0, 1.0)


def signed_distance(p: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    return point_triangle_distance(p, tris) * inside_sign(p, tris)


# ---------------------------------------------------------------- trainer
class SdfModel:
    def __init__(self, config: NGPNetworkConfig | None = None):
        cfg = config or NGPNetworkConfig()
        enc = cfg.encoding
        self.encoding = HashEncoding(
            n_levels=enc.n_levels,
            n_features_per_level=enc.n_features_per_level,
            log2_hashmap_size=enc.log2_hashmap_size,
            base_resolution=enc.base_resolution,
            per_level_scale=enc.resolve_per_level_scale(1),
            n_dims=3,
        )
        self.mlp = MLP(self.encoding.n_output_dims, 1,
                       n_neurons=cfg.network.n_neurons,
                       n_hidden_layers=cfg.network.n_hidden_layers)
        self.config = cfg

    def init(self, key):
        k1, k2 = jax.random.split(key)
        return {"hash_table": self.encoding.init(k1), "mlp": self.mlp.init(k2)}

    def __call__(self, params, x):
        feats = self.encoding(params["hash_table"], x, compute_dtype=jnp.bfloat16)
        return self.mlp(params["mlp"], feats)[:, 0].astype(jnp.float32)


class SdfTrainState(NamedTuple):
    params: dict
    opt_state: NGPOptState
    key: jax.Array


class SdfTrainer:
    """Fit an SdfModel to a triangle mesh scaled into the unit cube."""

    def __init__(self, model: SdfModel, triangles: np.ndarray,
                 batch_size: int = 1 << 14, surface_fraction: float = 0.5,
                 perturb_std: float = 0.02, use_takikawa: bool = False):
        self.model = model
        tris = np.asarray(triangles, np.float32)
        # normalize mesh into [0.25, 0.75]^3 (reference centers meshes in
        # the unit aabb with margin)
        lo = tris.reshape(-1, 3).min(0)
        hi = tris.reshape(-1, 3).max(0)
        scale = 0.5 / max(float((hi - lo).max()), 1e-9)
        self.mesh_offset = 0.5 - (lo + hi) * 0.5 * scale
        self.mesh_scale = scale
        self.tris = jnp.asarray(tris * scale + self.mesh_offset)
        if use_takikawa:
            # configs/sdf/takikawa.json path: surface-octree features
            from ..nn.mlp import MLP
            from ..nn.takikawa import TakikawaEncoding

            model.encoding = TakikawaEncoding(np.asarray(self.tris))
            model.mlp = MLP(model.encoding.n_output_dims, 1,
                            n_neurons=model.config.network.n_neurons,
                            n_hidden_layers=model.config.network.n_hidden_layers)
        areas = np.linalg.norm(
            np.cross(tris[:, 1] - tris[:, 0], tris[:, 2] - tris[:, 0]), axis=-1)
        self.tri_cdf = jnp.asarray(np.cumsum(areas) / areas.sum())
        self.batch_size = batch_size
        self.surface_fraction = surface_fraction
        self.perturb_std = perturb_std
        self.opt = NGPOptimizer(
            model.config.optimizer,
            l2_mask_fn=lambda p: {"hash_table": False,
                                  "mlp": [True] * len(p["mlp"])})
        self._step = jax.jit(self._train_step, donate_argnums=(0,))

    def init(self, key) -> SdfTrainState:
        params = self.model.init(key)
        return SdfTrainState(params, self.opt.init(params), key)

    def _sample_points(self, key):
        n_surf = int(self.batch_size * self.surface_fraction)
        n_free = self.batch_size - n_surf
        k1, k2, k3, k4 = jax.random.split(key, 4)
        # area-weighted surface samples + gaussian perturbation
        u = jax.random.uniform(k1, (n_surf,))
        ti = jnp.searchsorted(self.tri_cdf, u)
        bc = jax.random.uniform(k2, (n_surf, 2))
        s = jnp.sqrt(bc[:, :1])
        b0 = 1 - s
        b1 = s * (1 - bc[:, 1:])
        b2 = s * bc[:, 1:]
        tri = self.tris[ti]
        pts_surf = b0 * tri[:, 0] + b1 * tri[:, 1] + b2 * tri[:, 2]
        pts_surf = pts_surf + jax.random.normal(k3, pts_surf.shape) * self.perturb_std
        pts_free = jax.random.uniform(k4, (n_free, 3))
        return jnp.concatenate([pts_surf, pts_free]).clip(0.0, 1.0)

    def _train_step(self, state: SdfTrainState):
        key, k_pts = jax.random.split(state.key)
        pts = self._sample_points(k_pts)
        target = signed_distance(pts, self.tris)

        def loss_fn(p):
            pred = self.model(p, pts)
            return jnp.mean((pred - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        params, opt_state = self.opt.update(grads, state.opt_state, state.params)
        return SdfTrainState(params, opt_state, key), loss

    def step(self, state):
        return self._step(state)

    # ------------------------------------------------------------- render
    def render(self, state: SdfTrainState, camera, width=128, height=128,
               focal=None, n_iters: int = 64, eps: float = 1e-3,
               light_dir=(0.5, 1.0, -0.5), shadows: bool = True):
        """Sphere tracing + lambert shading + hard shadow ray
        (render_sdf behavior, testbed_sdf.cu)."""
        from ..core import camera as cam

        params = self.opt.inference_params(state.opt_state)
        focal = focal or (width * 1.2, height * 1.2)
        uv = np.stack(np.meshgrid(
            (np.arange(width) + 0.5) / width,
            (np.arange(height) + 0.5) / height), -1).reshape(-1, 2).astype(np.float32)
        rays = cam.uv_to_ray(jnp.asarray(uv), jnp.asarray(camera, jnp.float32),
                             (width, height), focal)
        d = rays.d / jnp.linalg.norm(rays.d, axis=-1, keepdims=True)

        @jax.jit
        def trace(p, o, d):
            def sphere_trace(o, d, t0):
                def body(i, carry):
                    t, done = carry
                    pos = jnp.clip(o + d * t[:, None], 0.0, 1.0)
                    s = self.model(p, pos)
                    done = done | (jnp.abs(s) < eps) | (t > 3.0)
                    t = jnp.where(done, t, t + s)
                    return t, done
                t, done = jax.lax.fori_loop(
                    0, n_iters, body,
                    (jnp.full(o.shape[0], t0), jnp.zeros(o.shape[0], bool)))
                pos = o + d * t[:, None]
                hit = (jnp.abs(self.model(p, jnp.clip(pos, 0, 1))) < 10 * eps) & (t <= 3.0)
                return t, pos, hit

            t, pos, hit = sphere_trace(o, d, 0.05)
            # normal via central differences of the SDF
            h = 2e-3
            grads = []
            for ax in range(3):
                e = jnp.zeros(3).at[ax].set(h)
                grads.append(self.model(p, jnp.clip(pos + e, 0, 1))
                             - self.model(p, jnp.clip(pos - e, 0, 1)))
            n = jnp.stack(grads, -1)
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
            l = jnp.asarray(light_dir, jnp.float32)
            l = l / jnp.linalg.norm(l)
            diff = jnp.maximum(jnp.sum(n * l, -1), 0.0)
            if shadows:
                _, _, sh_hit = sphere_trace(pos + n * 5e-3, jnp.broadcast_to(l, pos.shape), 0.01)
                diff = jnp.where(sh_hit, diff * 0.2, diff)
            shade = 0.15 + 0.85 * diff
            rgb = jnp.where(hit[:, None], shade[:, None] * jnp.ones(3), 1.0)
            return rgb, t, hit

        rgb, t, hit = trace(params, rays.o, d)
        return {
            "rgb": np.asarray(rgb).reshape(height, width, 3),
            "depth": np.asarray(t).reshape(height, width),
            "hit": np.asarray(hit).reshape(height, width),
        }

    def iou(self, state: SdfTrainState, resolution: int = 64) -> float:
        """Volumetric IoU vs ground truth on a lattice (calculate_iou)."""
        params = self.opt.inference_params(state.opt_state)
        g = np.linspace(0.05, 0.95, resolution, dtype=np.float32)
        x, y, z = np.meshgrid(g, g, g, indexing="ij")
        pts = jnp.asarray(np.stack([x, y, z], -1).reshape(-1, 3))
        chunk = 1 << 15
        inter = union = 0
        pred_fn = jax.jit(lambda p, q: self.model(p, q) < 0)
        true_fn = jax.jit(lambda q: signed_distance(q, self.tris) < 0)
        for i in range(0, pts.shape[0], chunk):
            q = pts[i:i + chunk]
            a = np.asarray(pred_fn(params, q))
            b = np.asarray(true_fn(q))
            inter += int((a & b).sum())
            union += int((a | b).sum())
        return inter / max(union, 1)
