"""Pallas TPU kernel: packet BVH traversal over the planar primitive soup.

The reference walks a pointer-based binary BVH per ray with recursion
(``bvh.rs:165-180``) — pointer chasing and per-ray divergence, both hostile
to a vector machine. The TPU-native inversion is *packet* traversal: a block
of 1024 rays ((8, 128) VPU lanes) shares ONE traversal stack, held in SMEM
and driven by the scalar core, while the AABB slab test and the leaf
primitive intersections run on all 1024 lanes at once. A node is descended
when ANY ray in the packet hits its box (one vector→scalar reduction per
step), so the packet does the union of its rays' traversals — cheap while
rays are coherent (camera rays, queue-ordered bounce rays) and never worse
than a brute-force sweep of the leaves it cannot prune.

Memory layout — two-level, VMEM-bounded at ANY scene size:

- **Top tree in VMEM**: the first ``TOP_LEVELS`` levels of the complete
  binary tree, ``(n_top, 8)`` f32 ``[minx miny minz maxx maxy maxz 0 0]``.
  Children of i are 2i+1 / 2i+2, no pointers; fetched with dynamic *scalar*
  loads (dynamic sublane, static lane — the Mosaic rule). The 8→128 lane
  pad costs 16x but the array is capped at 2^TOP_LEVELS-1 nodes (≤4 MB),
  independent of primitive count.
- **Leaf rows streamed from HBM**: the full leaf table lives in
  ``pltpu.ANY`` (HBM) as ``(n_leaves, 128)`` f32 — one leaf per row =
  8 prims x 16 fields ``[n(3) d g1(3) g1o g2(3) g2o is_tri valid slot pad]``
  (the unified quad/triangle functional form of ops/pallas_sweep.py). The
  bottom of the tree is cut into *treelets* of ``2^S`` consecutive leaf
  rows; when the packet's traversal reaches a treelet root it enqueues the
  treelet in an SMEM ring and starts an async DMA of its rows into one of
  ``NBUF`` VMEM slots. Treelets drain oldest-first while younger DMAs are
  still in flight — an NBUF-deep prefetch pipeline that hides HBM latency
  behind the slab tests of the ongoing top-tree walk. Inside a hit treelet
  the rays brute-force all 2^S rows (packet pruning below a hit box is
  weak, and skipping the subtree walk removes its nodes from the stream
  entirely).

This replaces the round-2 design that held nodes AND the whole leaf table
in VMEM and compile-OOM'd at 262k prims (48 MB scoped vs the 16 MB limit).

Spheres are not in the tree: every fixture/production scene has at most a
handful, and the brute sphere sweep is a single fused kernel already —
``bvh_planar_hit_pallas`` results are min-combined with it by the caller.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geo import ALMOST_ZERO, INF

BLOCK = 1024
_ROWS = 8
_LANES = 128

# top-tree levels kept in VMEM: 2^TOP_LEVELS - 1 nodes x 512 B = 4 MB max
# (sponza @ 262k prims: 32768 leaf rows -> tr=8 rows (64 prims, 4 KB) per
# treelet, 4096 treelet roots, 8191 top nodes)
TOP_LEVELS = 13
# in-flight treelet DMA slots (prefetch pipeline depth)
NBUF = 8


def _bvh_kernel(ox, oy, oz, dx, dy, dz, tmin_ref, nodes_ref, rows_hbm,
                out_t, out_slot, stack_ref, ring_ref, slot_ref, tile_ref,
                sems, *, n_troots, tr, leaf_size):
    """Packet traversal. n_troots = number of treelet roots (top-tree
    leaves); tr = leaf rows per treelet; leaf_size = prims per row."""
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    tmin = tmin_ref[...]

    # slab-test reciprocals (geo/mod.rs:159-188 precomputes 1/dir once);
    # padding rays have d = 0 -> inv = inf -> NaN/false comparisons -> miss
    invx = 1.0 / d[0]
    invy = 1.0 / d[1]
    invz = 1.0 / d[2]

    out_t[...] = jnp.full(tmin.shape, INF, jnp.float32)
    slot_ref[...] = jnp.full(tmin.shape, -1.0, jnp.float32)
    stack_ref[0] = jnp.int32(0)

    def node_f(n, f):
        # (n_top, 8): dynamic sublane, static lane (Mosaic scalar-load rule)
        return nodes_ref[n, f]

    def start_fetch(t, qt):
        """DMA treelet t's leaf rows into ring slot qt % NBUF."""
        slot = jax.lax.rem(qt, jnp.int32(NBUF))
        ring_ref[slot] = t
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(t * tr, tr), :],
            tile_ref.at[pl.ds(slot * tr, tr), :],
            sems.at[slot],
        ).start()

    def drain_oldest(qh):
        """Wait for the oldest in-flight treelet and intersect its rows."""
        slot = jax.lax.rem(qh, jnp.int32(NBUF))
        t = ring_ref[slot]
        pltpu.make_async_copy(
            rows_hbm.at[pl.ds(t * tr, tr), :],
            tile_ref.at[pl.ds(slot * tr, tr), :],
            sems.at[slot],
        ).wait()

        bt2 = out_t[...]
        bs2 = slot_ref[...]
        for m in range(tr):
            for si in range(leaf_size):
                def row_f(f, _m=m, _s=si):
                    # leaf-per-row layout: static lane index si*16+f
                    return tile_ref[slot * tr + _m, _s * 16 + f]

                nx = row_f(0)
                ny = row_f(1)
                nz = row_f(2)
                dpl = row_f(3)
                denom = nx * d[0] + ny * d[1] + nz * d[2]
                tt = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
                hx = o[0] + tt * d[0]
                hy = o[1] + tt * d[1]
                hz = o[2] + tt * d[2]
                u = (hx * row_f(4) + hy * row_f(5)
                     + hz * row_f(6) + row_f(7))
                v = (hx * row_f(8) + hy * row_f(9)
                     + hz * row_f(10) + row_f(11))
                is_tri = row_f(12) > 0.5
                valid = row_f(13) > 0.5
                base_ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
                contain = base_ok & ((is_tri & (u + v <= 1.0))
                                     | (~is_tri & (v <= 1.0)))
                ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
                      & (tt >= tmin) & (tt < bt2))
                slot_val = jnp.full_like(bs2, row_f(14))
                bt2 = jnp.where(ok, tt, bt2)
                bs2 = jnp.where(ok, slot_val, bs2)
        out_t[...] = bt2
        slot_ref[...] = bs2

    def body(carry):
        # NOTE: pl.when only — wrapping the DMA wait in a jax.lax.cond
        # branch DEADLOCKS on real hardware (verified on-chip; the pl.when
        # form runs correctly).
        sp, qh, qt = carry
        walking = sp > 0
        sp1 = jnp.maximum(sp - 1, 0)
        node = stack_ref[sp1]
        bt = out_t[...]

        t0 = (node_f(node, 0) - o[0]) * invx
        t1 = (node_f(node, 3) - o[0]) * invx
        near = jnp.minimum(t0, t1)
        far = jnp.maximum(t0, t1)
        t0 = (node_f(node, 1) - o[1]) * invy
        t1 = (node_f(node, 4) - o[1]) * invy
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
        t0 = (node_f(node, 2) - o[2]) * invz
        t1 = (node_f(node, 5) - o[2]) * invz
        near = jnp.maximum(near, jnp.minimum(t0, t1))
        far = jnp.minimum(far, jnp.maximum(t0, t1))
        near = jnp.maximum(near, 0.0)
        # non-empty interval (strict, like Aabb::hit) + closest-hit prune
        hit = (near < far) & (near <= bt)
        any_hit = jnp.max(hit.astype(jnp.int32)) > 0

        is_troot = node >= jnp.int32(n_troots - 1)
        push = walking & any_hit & jnp.logical_not(is_troot)
        enq = walking & any_hit & is_troot
        # retire the oldest treelet when the DMA ring is full, or when the
        # top-tree walk has finished and only the queue remains
        do_drain = (enq & (qt - qh >= jnp.int32(NBUF))) \
            | (jnp.logical_not(walking) & (qt > qh))

        @pl.when(push)
        def _():
            # far child below near child so the near child pops first
            stack_ref[sp1] = 2 * node + 2
            stack_ref[sp1 + 1] = 2 * node + 1

        @pl.when(do_drain)
        def _():
            drain_oldest(qh)

        qh2 = jnp.where(do_drain, qh + 1, qh)

        @pl.when(enq)
        def _():
            start_fetch(node - jnp.int32(n_troots - 1), qt)

        sp2 = jnp.where(walking, jnp.where(push, sp1 + 2, sp1), sp)
        qt2 = jnp.where(enq, qt + 1, qt)
        return sp2, qh2, qt2

    jax.lax.while_loop(
        lambda c: (c[0] > 0) | (c[2] > c[1]), body,
        (jnp.int32(1), jnp.int32(0), jnp.int32(0)))
    out_slot[...] = slot_ref[...].astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def bvh_planar_hit_pallas(kbvh, o, d, tmin, interpret=False):
    """Closest planar hit via packet BVH traversal. Returns (t, slot) with
    slot an index into the unified planar table (Solids.pl_*), -1 on miss
    (t = INF)."""
    r = o.shape[0]
    n_pad = (r + BLOCK - 1) // BLOCK * BLOCK
    pad = n_pad - r

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(n_pad // _LANES, _LANES)

    ox, oy, oz = (prep(o[:, i]) for i in range(3))
    dx, dy, dz = (prep(d[:, i]) for i in range(3))
    tminb = prep(jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,)))

    nodes = kbvh.top_nodes
    rows = kbvh.rows
    n_troots = kbvh.n_troots
    tr = kbvh.tr
    leaf_size = kbvh.leaf_size

    grid = (n_pad // BLOCK,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)

    # stack depth: top-tree depth + slack (pop 1 push 2 => depth+1 max)
    depth = max(1, n_troots.bit_length() + 2)

    t, slot = pl.pallas_call(
        functools.partial(_bvh_kernel, n_troots=n_troots, tr=tr,
                          leaf_size=leaf_size),
        grid=grid,
        in_specs=[ray_spec] * 7 + [top_spec, hbm_spec],
        out_specs=(ray_spec,
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.int32)),
        scratch_shapes=[pltpu.SMEM((depth + 8,), jnp.int32),   # stack
                        pltpu.SMEM((NBUF,), jnp.int32),        # DMA ring
                        pltpu.VMEM((_ROWS, _LANES), jnp.float32),  # best slot
                        pltpu.VMEM((NBUF * tr, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((NBUF,))],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tminb, nodes, rows)

    return t.reshape(-1)[:r], slot.reshape(-1)[:r]


def bvh_closest_hit_pallas(kbvh, solids, o, d, tmin, tmax, interpret=False):
    """Drop-in for ops.intersect.closest_solid_hit on BVH scenes: packet
    BVH over planar prims + brute sphere sweep, min-combined.
    Returns (t, kind, idx)."""
    from ..scene.compile import KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE
    from .pallas_sweep import closest_hit_pallas

    t_p, pslot = bvh_planar_hit_pallas(kbvh, o, d, tmin, interpret=interpret)
    pslot_c = jnp.clip(pslot, 0, solids.pl_idx.shape[0] - 1)
    kind_p = jnp.where(solids.pl_is_tri[pslot_c], KIND_TRIANGLE,
                       KIND_QUAD).astype(jnp.int32)
    idx_p = solids.pl_idx[pslot_c]

    if kbvh.has_spheres:
        t_s, slot_s = closest_hit_pallas(solids, o, d, tmin, tmax,
                                         spheres_only=True,
                                         interpret=interpret)
        sphere_wins = t_s <= t_p
        t = jnp.where(sphere_wins, t_s, t_p)
        kind = jnp.where(sphere_wins, KIND_SPHERE, kind_p).astype(jnp.int32)
        idx = jnp.where(sphere_wins, jnp.maximum(slot_s, 0), idx_p)
        return t, kind, idx
    return t_p, kind_p, idx_p
