"""Triangle BVH: host-side median-split build + TPU traversal.

Capability match for `TriangleBvh` (src/triangle_bvh.cu:615-718 build,
264-319 traversal; N10 in SURVEY.md §2): binary BVH splitting the
largest-variance axis at the median, <= 4 triangles per leaf. The build is
host-side (numpy) like the reference's CPU build; the C++ native build
(native/geometry.cpp) is used when compiled, numpy otherwise.

Traversal on TPU: a fixed-depth stack inside a `lax.while_loop`,
vectorized over rays with vmap — correct for arbitrary mesh sizes. For
the small meshes the reference ships, `ray_triangles_intersect`'s dense
brute force is faster; `TriangleBvh.intersect` picks automatically.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .triangle import ray_triangles_intersect, ray_triangles_any_hit

LEAF_SIZE = 4
STACK_DEPTH = 48
# Above this the packed world carries BVH node arrays and tracing
# traverses them; below it the tracer uses the dense (rays x tris)
# brute force. History: 4096 -> 512 in round 3 when the UNROLLED
# distribution-RT loops kept many (R*S, T) temps alive at once and
# OOM'd the chip; back to 4096 in round 5 now that the tracer scans its
# sample loops (raytracer.py) so exactly one (R, T) intersection tensor
# is live at a time. Measured on the v5e chip (r5_hybrid_probe):
# brute-force full-settings trace is ~5x faster than the vmapped
# while-loop BVH traversal for the 995-tri armadillo (0.26 vs 1.3
# ms/ray) — serial per-ray stack loops are TPU-hostile.
BRUTE_FORCE_MAX_TRIS = 4096


def bvh_node_depth(left: np.ndarray, right: np.ndarray) -> int:
    """Max node depth of the flat tree (root = 1). The traversal stack
    needs at most depth+1 slots (it pops one node and pushes <= 2)."""
    left = np.asarray(left)
    right = np.asarray(right)
    depth = np.zeros(len(left), np.int32)
    maxd = 1
    # nodes are emitted parent-before-child, so one forward pass suffices
    for n in range(len(left)):
        d = depth[n] if depth[n] else 1
        depth[n] = d
        maxd = max(maxd, d)
        if left[n] >= 0:
            depth[left[n]] = d + 1
            depth[right[n]] = d + 1
    return int(maxd)


def bvh_traverse(nodes: dict, o: jnp.ndarray, d: jnp.ndarray):
    """Closest-hit traversal as a pure function over a node-array dict
    (keys: lo, hi, left, right, first, count, tris) — usable inside any
    jitted program that threads the arrays as arguments (e.g. the hybrid
    tracer's `world` dict; jit-captured constants are re-uploaded per
    dispatch by the remote-TPU relay, arguments are not).

    Returns (t, tri_idx, u, v); tri_idx indexes the REORDERED nodes["tris"].
    The fixed stack provably cannot overflow: TriangleBvh.__init__ checks
    tree depth + 1 <= STACK_DEPTH at build time and raises otherwise
    (median splits give depth ~ log2(n_tris / LEAF_SIZE) + 1, so the
    48-deep stack covers any buildable mesh).
    """
    lo, hi = nodes["lo"], nodes["hi"]
    left, right = nodes["left"], nodes["right"]
    first, count = nodes["first"], nodes["count"]
    tris = nodes["tris"]
    pad = LEAF_SIZE

    def one_ray(o1, d1):
        inv_d = 1.0 / jnp.where(jnp.abs(d1) < 1e-12, 1e-12, d1)

        def node_hit(n, t_best):
            t0 = (lo[n] - o1) * inv_d
            t1 = (hi[n] - o1) * inv_d
            tmin = jnp.max(jnp.minimum(t0, t1))
            tmax = jnp.min(jnp.maximum(t0, t1))
            return (tmin <= tmax) & (tmax > 0) & (tmin < t_best)

        def body(carry):
            stack, sp, t_best, best_idx = carry
            sp = sp - 1
            n = stack[sp]
            is_leaf = left[n] < 0

            def do_leaf(args):
                t_best, best_idx = args
                base = first[n]
                idxs = base + jnp.arange(pad)
                mask = jnp.arange(pad) < count[n]
                tri = tris[jnp.clip(idxs, 0, tris.shape[0] - 1)]
                v0 = tri[:, 0]
                e1 = tri[:, 1] - v0
                e2 = tri[:, 2] - v0
                pvec = jnp.cross(d1[None], e2)
                det = jnp.sum(pvec * e1, -1)
                inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
                tvec = o1[None] - v0
                u = jnp.sum(tvec * pvec, -1) * inv_det
                qvec = jnp.cross(tvec, e1)
                v = jnp.sum(qvec * d1[None], -1) * inv_det
                t = jnp.sum(qvec * e2, -1) * inv_det
                ok = mask & (jnp.abs(det) >= 1e-9) & (u >= 0) & (v >= 0) \
                    & (u + v <= 1) & (t > 1e-9) & (t < t_best)
                t_m = jnp.where(ok, t, jnp.inf)
                k = jnp.argmin(t_m)
                better = t_m[k] < t_best
                return (jnp.where(better, t_m[k], t_best),
                        jnp.where(better, idxs[k], best_idx))

            t_best, best_idx = jax.lax.cond(
                is_leaf, do_leaf, lambda a: a, (t_best, best_idx))

            l, r = left[n], right[n]
            push_l = (~is_leaf) & node_hit(l, t_best)
            push_r = (~is_leaf) & node_hit(r, t_best)
            stack = stack.at[sp].set(jnp.where(push_l, l, stack[sp]))
            sp = sp + push_l.astype(jnp.int32)
            stack = stack.at[sp].set(jnp.where(push_r, r, stack[sp]))
            sp = sp + push_r.astype(jnp.int32)
            return stack, sp, t_best, best_idx

        def cond(carry):
            _, sp, _, _ = carry
            return sp > 0

        stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
        carry = (stack0, jnp.array(1, jnp.int32), jnp.array(jnp.inf),
                 jnp.array(-1, jnp.int32))
        _, _, t_best, best_idx = jax.lax.while_loop(cond, body, carry)
        return t_best, best_idx

    t, idx = jax.vmap(one_ray)(o, d)
    tri = tris[jnp.clip(idx, 0, tris.shape[0] - 1)]
    v0 = tri[:, 0]
    e1 = tri[:, 1] - v0
    e2 = tri[:, 2] - v0
    pvec = jnp.cross(d, e2)
    det = jnp.sum(pvec * e1, -1)
    inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
    tvec = o - v0
    u = jnp.sum(tvec * pvec, -1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = jnp.sum(qvec * d, -1) * inv_det
    miss = idx < 0
    return (jnp.where(miss, jnp.inf, t), idx,
            jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v))


class TriangleBvh:
    """Flat-array BVH. Node arrays:
    bounds_lo/hi (M, 3); left (M,) child index or -1 for leaf;
    right (M,); first (M,), count (M,) triangle range for leaves.
    Triangles are reordered so leaves own contiguous ranges."""

    def __init__(self, tris: np.ndarray, use_native: bool = True):
        tris = np.asarray(tris, np.float32)
        self.n_tris = len(tris)
        if use_native and self.n_tris > 0:
            from .native import bvh_build_native

            nb = bvh_build_native(tris, LEAF_SIZE)
            if nb is not None:
                self.order = np.asarray(nb["order"])
                self.tris = jnp.asarray(tris[self.order])
                self.bounds_lo = jnp.asarray(nb["lo"])
                self.bounds_hi = jnp.asarray(nb["hi"])
                self.left = jnp.asarray(nb["left"])
                self.right = jnp.asarray(nb["right"])
                self.first = jnp.asarray(nb["first"])
                self.count = jnp.asarray(nb["count"])
                self.n_nodes = len(nb["left"])
                self._check_depth(nb["left"], nb["right"])
                return
        lo_list, hi_list, left, right, first, count = [], [], [], [], [], []
        centroids = tris.mean(axis=1)
        order = np.arange(len(tris))

        def build(idx: np.ndarray) -> int:
            node = len(lo_list)
            pts = tris[idx].reshape(-1, 3)
            lo_list.append(pts.min(0) if len(pts) else np.zeros(3, np.float32))
            hi_list.append(pts.max(0) if len(pts) else np.zeros(3, np.float32))
            left.append(-1); right.append(-1); first.append(0); count.append(0)
            if len(idx) <= LEAF_SIZE:
                first[node] = len(ordered)
                count[node] = len(idx)
                ordered.extend(idx.tolist())
                return node
            c = centroids[idx]
            axis = int(np.argmax(c.var(axis=0)))
            mid = len(idx) // 2
            part = np.argpartition(c[:, axis], mid)
            l = build(idx[part[:mid]])
            r = build(idx[part[mid:]])
            left[node] = l
            right[node] = r
            return node

        ordered: list[int] = []
        import sys

        rec = sys.getrecursionlimit()
        sys.setrecursionlimit(max(rec, 10000))
        build(order)
        sys.setrecursionlimit(rec)

        self.order = (np.asarray(ordered, np.int64) if ordered
                      else np.arange(len(tris)))
        self.tris = jnp.asarray(tris[self.order]) if ordered else jnp.asarray(tris)
        self.bounds_lo = jnp.asarray(np.stack(lo_list))
        self.bounds_hi = jnp.asarray(np.stack(hi_list))
        self.left = jnp.asarray(np.asarray(left, np.int32))
        self.right = jnp.asarray(np.asarray(right, np.int32))
        self.first = jnp.asarray(np.asarray(first, np.int32))
        self.count = jnp.asarray(np.asarray(count, np.int32))
        self.n_nodes = len(lo_list)
        self._check_depth(left, right)

    def _check_depth(self, left, right):
        """Build-time guarantee that the fixed traversal stack cannot
        overflow (round-1's traversal silently overwrote the stack top
        on saturation — a correctness trap; now it raises at build)."""
        self.depth = bvh_node_depth(left, right)
        if self.depth + 1 > STACK_DEPTH:
            raise ValueError(
                f"BVH depth {self.depth} needs a stack deeper than "
                f"{STACK_DEPTH}; rebuild with a larger STACK_DEPTH")

    def node_arrays(self) -> dict:
        """Arrays for `bvh_traverse` — thread through jitted programs as
        arguments (e.g. merged into the tracer's world dict)."""
        return {"lo": self.bounds_lo, "hi": self.bounds_hi,
                "left": self.left, "right": self.right,
                "first": self.first, "count": self.count,
                "tris": self.tris}

    # ------------------------------------------------------------ queries
    def intersect(self, o: jnp.ndarray, d: jnp.ndarray, t_max=jnp.inf):
        """Closest hit: returns (t, tri_idx, u, v) like
        ray_triangles_intersect (tri_idx refers to the REORDERED array
        `self.tris`)."""
        if self.n_tris <= BRUTE_FORCE_MAX_TRIS:
            return ray_triangles_intersect(o, d, self.tris, t_max)
        return self._traverse(o, d)

    def any_hit(self, o, d, t_min=0.0, t_max=jnp.inf):
        if self.n_tris <= BRUTE_FORCE_MAX_TRIS:
            return ray_triangles_any_hit(o, d, self.tris, t_min, t_max)
        t, idx, _, _ = self._traverse(o, d)
        return (idx >= 0) & (t > t_min) & (t < t_max)

    def _traverse(self, o, d):
        """Stack-based traversal, vmapped over rays."""
        lo, hi = self.bounds_lo, self.bounds_hi
        left, right = self.left, self.right
        first, count = self.first, self.count
        tris = self.tris
        pad = LEAF_SIZE

        def one_ray(o1, d1):
            inv_d = 1.0 / jnp.where(jnp.abs(d1) < 1e-12, 1e-12, d1)

            def node_hit(n, t_best):
                t0 = (lo[n] - o1) * inv_d
                t1 = (hi[n] - o1) * inv_d
                tmin = jnp.max(jnp.minimum(t0, t1))
                tmax = jnp.min(jnp.maximum(t0, t1))
                return (tmin <= tmax) & (tmax > 0) & (tmin < t_best)

            def body(carry):
                stack, sp, t_best, best_idx = carry
                sp = sp - 1
                n = stack[sp]
                is_leaf = left[n] < 0

                def do_leaf(args):
                    t_best, best_idx = args
                    base = first[n]
                    idxs = base + jnp.arange(pad)
                    mask = jnp.arange(pad) < count[n]
                    tri = tris[jnp.clip(idxs, 0, tris.shape[0] - 1)]
                    v0 = tri[:, 0]
                    e1 = tri[:, 1] - v0
                    e2 = tri[:, 2] - v0
                    pvec = jnp.cross(d1[None], e2)
                    det = jnp.sum(pvec * e1, -1)
                    inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
                    tvec = o1[None] - v0
                    u = jnp.sum(tvec * pvec, -1) * inv_det
                    qvec = jnp.cross(tvec, e1)
                    v = jnp.sum(qvec * d1[None], -1) * inv_det
                    t = jnp.sum(qvec * e2, -1) * inv_det
                    ok = mask & (jnp.abs(det) >= 1e-9) & (u >= 0) & (v >= 0) \
                        & (u + v <= 1) & (t > 1e-9) & (t < t_best)
                    t_m = jnp.where(ok, t, jnp.inf)
                    k = jnp.argmin(t_m)
                    better = t_m[k] < t_best
                    return (jnp.where(better, t_m[k], t_best),
                            jnp.where(better, idxs[k], best_idx))

                def do_inner(args):
                    return args

                t_best, best_idx = jax.lax.cond(
                    is_leaf, do_leaf, do_inner, (t_best, best_idx)
                )

                # push children that the ray's current best still reaches
                l, r = left[n], right[n]
                push_l = (~is_leaf) & node_hit(l, t_best)
                push_r = (~is_leaf) & node_hit(r, t_best)
                stack = stack.at[sp].set(jnp.where(push_l, l, stack[sp]))
                sp = sp + push_l.astype(jnp.int32)
                stack = stack.at[jnp.minimum(sp, STACK_DEPTH - 1)].set(
                    jnp.where(push_r, r, stack[jnp.minimum(sp, STACK_DEPTH - 1)])
                )
                sp = sp + push_r.astype(jnp.int32)
                return stack, sp, t_best, best_idx

            def cond(carry):
                _, sp, _, _ = carry
                return sp > 0

            stack0 = jnp.zeros(STACK_DEPTH, jnp.int32)
            carry = (stack0, jnp.array(1, jnp.int32), jnp.array(jnp.inf),
                     jnp.array(-1, jnp.int32))
            _, _, t_best, best_idx = jax.lax.while_loop(cond, body, carry)
            return t_best, best_idx

        t, idx = jax.vmap(one_ray)(o, d)
        # recover u, v for hits via a single per-hit recompute
        tri = self.tris[jnp.clip(idx, 0, self.tris.shape[0] - 1)]
        v0 = tri[:, 0]
        e1 = tri[:, 1] - v0
        e2 = tri[:, 2] - v0
        pvec = jnp.cross(d, e2)
        det = jnp.sum(pvec * e1, -1)
        inv_det = jnp.where(jnp.abs(det) < 1e-9, 0.0, 1.0 / det)
        tvec = o - v0
        u = jnp.sum(tvec * pvec, -1) * inv_det
        qvec = jnp.cross(tvec, e1)
        v = jnp.sum(qvec * d, -1) * inv_det
        miss = idx < 0
        return (jnp.where(miss, jnp.inf, t), idx,
                jnp.where(miss, 0.0, u), jnp.where(miss, 0.0, v))
