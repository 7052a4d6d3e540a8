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

Data layout (built by ``accel.build_kernel_bvh``):
- ``nodes``  (n_nodes, 8) f32 in VMEM — complete-tree AABBs
  [minx miny minz maxx maxy maxz 0 0]; children of i are 2i+1/2i+2, no
  pointers. Fetched with dynamic *scalar* loads (the scalar core runs ahead
  of the VPU).
- ``rows``   (n_leaves*leaf, 16) f32 in VMEM — leaf-ordered planar rows
  [n(3) d g1(3) g1o g2(3) g2o is_tri valid slot pad], the same unified
  quad/triangle functional form as ops/pallas_sweep.py.

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


def _bvh_kernel(ox, oy, oz, dx, dy, dz, tmin_ref, nodes_ref, rows_ref,
                out_t, out_slot, stack_ref, slot_ref, *, n_leaves, leaf_size):
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
        # (n_nodes, 8): dynamic sublane, static lane (Mosaic scalar-load rule)
        return nodes_ref[n, f]

    def body(sp):
        sp1 = sp - 1
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

        is_leaf = node >= jnp.int32(n_leaves - 1)
        push = any_hit & jnp.logical_not(is_leaf)
        do_leaf = any_hit & is_leaf

        @pl.when(push)
        def _():
            # far child below near child so the near child pops first
            stack_ref[sp1] = 2 * node + 2
            stack_ref[sp1 + 1] = 2 * node + 1

        @pl.when(do_leaf)
        def _():
            leaf = node - jnp.int32(n_leaves - 1)
            bt2 = out_t[...]
            bs2 = slot_ref[...]
            for si in range(leaf_size):
                def row_f(f, _s=si):
                    # leaf-per-row layout: static lane index si*16+f
                    return rows_ref[leaf, _s * 16 + f]

                nx = row_f(0)
                ny = row_f(1)
                nz = row_f(2)
                dpl = row_f(3)
                denom = nx * d[0] + ny * d[1] + nz * d[2]
                t = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
                hx = o[0] + t * d[0]
                hy = o[1] + t * d[1]
                hz = o[2] + t * d[2]
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
                      & (t >= tmin) & (t < bt2))
                slot_val = jnp.full_like(bs2, row_f(14))
                bt2 = jnp.where(ok, t, bt2)
                bs2 = jnp.where(ok, slot_val, bs2)
            out_t[...] = bt2
            slot_ref[...] = bs2

        return jnp.where(push, sp1 + 2, sp1)

    jax.lax.while_loop(lambda sp: sp > 0, body, jnp.int32(1))
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

    nodes = kbvh.nodes
    rows = kbvh.rows
    n_leaves = kbvh.n_leaves
    leaf_size = kbvh.leaf_size

    grid = (n_pad // BLOCK,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    table_spec = pl.BlockSpec(memory_space=pltpu.VMEM)

    # stack depth: complete-tree depth + slack (pop 1 push 2 => depth+1 max)
    depth = max(1, n_leaves.bit_length() + 2)

    t, slot = pl.pallas_call(
        functools.partial(_bvh_kernel, n_leaves=n_leaves,
                          leaf_size=leaf_size),
        grid=grid,
        in_specs=[ray_spec] * 7 + [table_spec, table_spec],
        out_specs=(ray_spec,
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.int32)),
        scratch_shapes=[pltpu.SMEM((depth + 8,), jnp.int32),
                        pltpu.VMEM((_ROWS, _LANES), jnp.float32)],
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
