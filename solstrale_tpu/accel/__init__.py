"""Linear BVH: Morton-ordered complete binary tree, flattened for wavefront
traversal.

The reference builds a pointer-based binary BVH with recursive rayon::join
splits (bvh.rs:84-162) and traverses it per ray with recursion
(bvh.rs:165-180). The TPU-native design inverts this into data-parallel form:

- build: Morton-code sort of primitive centroids + *complete* binary tree
  over the sorted order (leaves padded to a power of two). A complete tree
  needs no child pointers — node i's children are 2i+1 / 2i+2 — so the
  whole BVH is just two (n_nodes, 3) AABB arrays plus a leaf→primitive
  permutation. Builds run in numpy on host or fully on device in jnp
  (sort + segment reductions), and a C++ builder in native/ covers huge
  scenes.
- traversal: every ray carries an explicit stack in a (R, depth+1) int32
  array; the wavefront pops/tests/pushes in lockstep under a while_loop.
  AABB slab test matches geo/mod.rs:159-188.
"""
from __future__ import annotations

from dataclasses import dataclass, fields

import jax
import jax.numpy as jnp
import numpy as np

from ..geo import INF
from ..scene.compile import KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE, Solids

LEAF_SIZE = 4


def _pytree(cls):
    cls = dataclass(frozen=True)(cls)
    jax.tree_util.register_pytree_node(
        cls,
        lambda o: (tuple(getattr(o, f.name) for f in fields(cls)), None),
        lambda _, c: cls(*c))
    return cls


@_pytree
class Bvh:
    node_min: jnp.ndarray   # (2*n_leaves-1, 3)
    node_max: jnp.ndarray
    lp_kind: jnp.ndarray    # (n_leaves*LEAF_SIZE,) int32, -1 = padding
    lp_idx: jnp.ndarray     # (n_leaves*LEAF_SIZE,) int32


def _expand_bits(v):
    """Spread the low 10 bits of v over 30 bits (Morton interleave)."""
    v = (v * 0x00010001) & 0xFF0000FF
    v = (v * 0x00000101) & 0x0F00F00F
    v = (v * 0x00000011) & 0xC30C30C3
    v = (v * 0x00000005) & 0x49249249
    return v


def morton_codes(centroids):
    """30-bit Morton codes of points normalized to the overall AABB."""
    c = np.asarray(centroids, np.float64)
    lo = c.min(axis=0)
    hi = c.max(axis=0)
    ext = np.maximum(hi - lo, 1e-12)
    q = np.clip(((c - lo) / ext) * 1023.0, 0, 1023).astype(np.uint32)
    return (_expand_bits(q[:, 0]) << 2) | (_expand_bits(q[:, 1]) << 1) | \
        _expand_bits(q[:, 2])


def solids_aabbs(s: Solids):
    """Per-primitive AABBs for the unified prim list (host numpy).

    Quad/triangle AABBs are padded on degenerate axes like the reference
    (quad.rs:45-50, triangle.rs:67, geo/mod.rs:134-156).
    Returns (kinds, idxs, aabb_min, aabb_max) for valid prims only.
    """
    PAD = 1e-4
    kinds, idxs, mins, maxs = [], [], [], []

    sc = np.asarray(s.sph_center, np.float64)
    sr = np.asarray(s.sph_radius, np.float64)
    for i in np.nonzero(np.asarray(s.sph_valid))[0]:
        kinds.append(KIND_SPHERE); idxs.append(i)
        mins.append(sc[i] - sr[i]); maxs.append(sc[i] + sr[i])

    qq = np.asarray(s.qd_q, np.float64)
    qu = np.asarray(s.qd_u, np.float64)
    qv = np.asarray(s.qd_v, np.float64)
    for i in np.nonzero(np.asarray(s.qd_valid))[0]:
        pts = np.stack([qq[i], qq[i] + qu[i], qq[i] + qv[i],
                        qq[i] + qu[i] + qv[i]])
        lo, hi = pts.min(0), pts.max(0)
        pad = (hi - lo) < PAD
        lo[pad] -= PAD / 2; hi[pad] += PAD / 2
        kinds.append(KIND_QUAD); idxs.append(i)
        mins.append(lo); maxs.append(hi)

    tv = np.asarray(s.tr_v0, np.float64)
    te1 = np.asarray(s.tr_e1, np.float64)
    te2 = np.asarray(s.tr_e2, np.float64)
    for i in np.nonzero(np.asarray(s.tr_valid))[0]:
        pts = np.stack([tv[i], tv[i] + te1[i], tv[i] + te2[i]])
        lo, hi = pts.min(0), pts.max(0)
        pad = (hi - lo) < PAD
        lo[pad] -= PAD / 2; hi[pad] += PAD / 2
        kinds.append(KIND_TRIANGLE); idxs.append(i)
        mins.append(lo); maxs.append(hi)

    return (np.asarray(kinds, np.int32), np.asarray(idxs, np.int32),
            np.asarray(mins, np.float64), np.asarray(maxs, np.float64))


def build_bvh(s: Solids, leaf_size=LEAF_SIZE) -> Bvh:
    """Host-side LBVH build (numpy): Morton sort + complete-tree AABBs."""
    kinds, idxs, mins, maxs = solids_aabbs(s)
    n = len(kinds)
    order = np.argsort(morton_codes((mins + maxs) / 2.0), kind="stable")
    kinds, idxs = kinds[order], idxs[order]
    mins, maxs = mins[order], maxs[order]

    n_leaves = max(1, 1 << int(np.ceil(np.log2(max(1, (n + leaf_size - 1)
                                                   // leaf_size)))))
    n_slots = n_leaves * leaf_size
    lp_kind = np.full(n_slots, -1, np.int32)
    lp_idx = np.zeros(n_slots, np.int32)
    lp_kind[:n] = kinds
    lp_idx[:n] = idxs

    # leaf AABBs
    slot_min = np.full((n_slots, 3), np.inf)
    slot_max = np.full((n_slots, 3), -np.inf)
    slot_min[:n] = mins
    slot_max[:n] = maxs
    leaf_min = slot_min.reshape(n_leaves, leaf_size, 3).min(1)
    leaf_max = slot_max.reshape(n_leaves, leaf_size, 3).max(1)

    n_nodes = 2 * n_leaves - 1
    node_min = np.full((n_nodes, 3), np.inf)
    node_max = np.full((n_nodes, 3), -np.inf)
    node_min[n_leaves - 1:] = leaf_min
    node_max[n_leaves - 1:] = leaf_max
    for i in range(n_leaves - 2, -1, -1):
        node_min[i] = np.minimum(node_min[2 * i + 1], node_min[2 * i + 2])
        node_max[i] = np.maximum(node_max[2 * i + 1], node_max[2 * i + 2])

    return Bvh(node_min=jnp.asarray(node_min, jnp.float32),
               node_max=jnp.asarray(node_max, jnp.float32),
               lp_kind=jnp.asarray(lp_kind),
               lp_idx=jnp.asarray(lp_idx))


def build_bvh_device(aabb_min, aabb_max, kinds, idxs, leaf_size=LEAF_SIZE):
    """On-device LBVH build (jnp): Morton sort + bottom-up level reductions.

    Takes per-prim AABBs as device arrays; returns a Bvh. All steps are
    XLA-compilable (sort, gather, reshape-reduce by levels), fulfilling the
    'LBVH built on-device' requirement for dynamic scenes.
    """
    n = aabb_min.shape[0]
    centroid = (aabb_min + aabb_max) * 0.5
    lo = jnp.min(centroid, axis=0)
    hi = jnp.max(centroid, axis=0)
    ext = jnp.maximum(hi - lo, 1e-12)
    q = jnp.clip((centroid - lo) / ext * 1023.0, 0, 1023).astype(jnp.uint32)

    def expand(v):
        v = (v * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
        v = (v * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
        v = (v * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
        v = (v * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
        return v

    code = (expand(q[:, 0]) << 2) | (expand(q[:, 1]) << 1) | expand(q[:, 2])
    order = jnp.argsort(code)
    kinds = kinds[order]
    idxs = idxs[order]
    mins = aabb_min[order]
    maxs = aabb_max[order]

    n_leaves = max(1, 1 << int(np.ceil(np.log2(max(1, (n + leaf_size - 1)
                                                   // leaf_size)))))
    n_slots = n_leaves * leaf_size
    pad = n_slots - n
    lp_kind = jnp.concatenate([kinds, jnp.full((pad,), -1, jnp.int32)])
    lp_idx = jnp.concatenate([idxs, jnp.zeros((pad,), jnp.int32)])
    slot_min = jnp.concatenate([mins, jnp.full((pad, 3), INF)])
    slot_max = jnp.concatenate([maxs, jnp.full((pad, 3), -INF)])

    level_min = slot_min.reshape(n_leaves, leaf_size, 3).min(1)
    level_max = slot_max.reshape(n_leaves, leaf_size, 3).max(1)
    levels_min = [level_min]
    levels_max = [level_max]
    while levels_min[-1].shape[0] > 1:
        m = levels_min[-1].reshape(-1, 2, 3)
        x = levels_max[-1].reshape(-1, 2, 3)
        levels_min.append(m.min(1))
        levels_max.append(x.max(1))
    node_min = jnp.concatenate(levels_min[::-1], axis=0)
    node_max = jnp.concatenate(levels_max[::-1], axis=0)
    return Bvh(node_min=node_min.astype(jnp.float32),
               node_max=node_max.astype(jnp.float32),
               lp_kind=lp_kind, lp_idx=lp_idx)


def _slab_hit(o, d, t_min_limit, t_max_limit, nmin, nmax):
    """Branchless slab test matching Aabb::hit (geo/mod.rs:159-188): the
    running interval starts at [0, inf) and must stay non-empty (strict)."""
    inv = 1.0 / d
    t0 = (nmin - o) * inv
    t1 = (nmax - o) * inv
    near = jnp.minimum(t0, t1)
    far = jnp.maximum(t0, t1)
    t_min = jnp.maximum(jnp.max(near, axis=-1), 0.0)
    t_max = jnp.min(far, axis=-1)
    # non-empty interval (strict, like the reference), and not entirely
    # beyond the current closest hit
    return (t_min < t_max) & (t_min <= t_max_limit)


def _intersect_one(s: Solids, kind, idx, o, d, tmin, tmax):
    """Single-primitive intersection per ray, dispatched on kind."""
    from ..ops import intersect as I

    # sphere
    c = s.sph_center[idx]
    r = s.sph_radius[idx]
    oc = o - c
    a = jnp.sum(d * d, -1)
    half_b = jnp.sum(oc * d, -1)
    c2 = jnp.sum(oc * oc, -1) - r * r
    disc = half_b * half_b - a * c2
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    r1 = (-half_b - sq) / a
    r2 = (-half_b + sq) / a
    ok = disc >= 0.0
    ts = jnp.where(ok & (r1 >= tmin) & (r1 <= tmax), r1,
                   jnp.where(ok & (r2 >= tmin) & (r2 <= tmax), r2, INF))

    # quad
    qn = s.qd_normal[idx]
    denom = jnp.sum(qn * d, -1)
    t = (s.qd_d[idx] - jnp.sum(qn * o, -1)) / denom
    hp = o + d * t[..., None]
    pv = hp - s.qd_q[idx]
    w = s.qd_w[idx]
    pu = jnp.sum(w * jnp.cross(pv, s.qd_v[idx]), -1)
    pvv = jnp.sum(w * jnp.cross(s.qd_u[idx], pv), -1)
    okq = ((jnp.abs(denom) >= 1e-8) & (pu >= 0) & (pu <= 1) & (pvv >= 0)
           & (pvv <= 1) & (t >= tmin) & (t <= tmax))
    tq = jnp.where(okq, t, INF)

    # triangle
    e1 = s.tr_e1[idx]
    e2 = s.tr_e2[idx]
    pvec = jnp.cross(d, e2)
    det = jnp.sum(e1 * pvec, -1)
    invd = 1.0 / det
    tvec = o - s.tr_v0[idx]
    qvec = jnp.cross(tvec, e1)
    bu = jnp.sum(tvec * pvec, -1) * invd
    bv = jnp.sum(d * qvec, -1) * invd
    tt = jnp.sum(e2 * qvec, -1) * invd
    okt = ((jnp.abs(det) >= 1e-8) & (bu >= 0) & (bu <= 1) & (bv >= 0)
           & (bu + bv <= 1) & (tt >= tmin) & (tt <= tmax))
    ttv = jnp.where(okt, tt, INF)

    t = jnp.where(kind == KIND_SPHERE, ts,
                  jnp.where(kind == KIND_QUAD, tq, ttv))
    return jnp.where(kind < 0, INF, t)


def bvh_closest_hit(bvh: Bvh, s: Solids, o, d, tmin, tmax, leaf_size=LEAF_SIZE):
    """Wavefront stack traversal. Returns (t, kind, idx) like
    ops.intersect.closest_solid_hit."""
    R = o.shape[0]
    n_nodes = bvh.node_min.shape[0]
    n_leaves = (n_nodes + 1) // 2
    depth = int(np.log2(n_leaves)) + 1
    stack_size = depth + 2

    tmin_b = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (R,))
    tmax_b = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (R,))

    stack = jnp.zeros((R, stack_size), jnp.int32)
    sp = jnp.ones((R,), jnp.int32)          # root pushed
    best_t = tmax_b
    best_kind = jnp.zeros((R,), jnp.int32)
    best_idx = jnp.zeros((R,), jnp.int32)
    rr = jnp.arange(R)

    def cond(state):
        _, sp, *_ = state
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_kind, best_idx = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = stack[rr, top]
        sp = jnp.where(active, sp - 1, sp)

        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        hit = _slab_hit(o, d, tmin_b, best_t, nmin, nmax) & active

        is_leaf = node >= (n_leaves - 1)
        push = hit & ~is_leaf
        right = 2 * node + 2
        left = 2 * node + 1
        stack2 = stack.at[rr, jnp.minimum(sp, stack_size - 1)].set(
            jnp.where(push, right, stack[rr, jnp.minimum(sp, stack_size - 1)]))
        sp = jnp.where(push, sp + 1, sp)
        stack2 = stack2.at[rr, jnp.minimum(sp, stack_size - 1)].set(
            jnp.where(push, left, stack2[rr, jnp.minimum(sp, stack_size - 1)]))
        sp = jnp.where(push, sp + 1, sp)

        do_leaf = hit & is_leaf
        leaf_base = (node - (n_leaves - 1)) * leaf_size
        for sidx in range(leaf_size):
            slot = leaf_base + sidx
            kind = bvh.lp_kind[slot]
            idx = bvh.lp_idx[slot]
            t = _intersect_one(s, kind, idx, o, d, tmin_b, best_t)
            better = do_leaf & (t < best_t)
            best_t = jnp.where(better, t, best_t)
            best_kind = jnp.where(better, kind, best_kind)
            best_idx = jnp.where(better, idx, best_idx)

        return stack2, sp, best_t, best_kind, best_idx

    _, _, best_t, best_kind, best_idx = jax.lax.while_loop(
        cond, body, (stack, sp, best_t, best_kind, best_idx))

    t = jnp.where(best_t < tmax_b, best_t, INF)
    return t, best_kind, best_idx
