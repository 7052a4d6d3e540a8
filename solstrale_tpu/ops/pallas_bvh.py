"""Pallas TPU kernel: packet BVH traversal over the planar primitive soup.

The reference walks a pointer-based binary BVH per ray with recursion
(``bvh.rs:165-180``) — pointer chasing and per-ray divergence, both hostile
to a vector machine. The TPU-native inversion is *packet* traversal: a block
of 1024 rays shares ONE traversal over the tree, driven by the scalar core,
while all per-primitive work runs data-parallel on the VPU. The kernel was
shaped by on-chip microbenchmarks (see PERF.md):

- **Branchless batched walk.** Scalar-side branches (``lax.cond`` /
  ``pl.when``) around vector state cost hundreds of cycles each, and a
  ``lax.cond`` around a DMA wait deadlocks outright (measured). The walk
  therefore tests FB=8 frontier nodes per while-iteration (their
  vector→scalar ``any_hit`` reductions overlap: 42 vs 178 cycles/node
  measured) and uses NO conditionals at all: child/treelet appends are
  unconditional SMEM stores whose queue pointers advance by a predicated
  amount — garbage beyond the final pointers is simply never read.
- **Packet max-t pruning, refreshed per drain round.** The walk's slab
  test culls nodes whose entry distance exceeds the packet's worst
  current best hit (max over valid rays of the per-ray closest t so far,
  a single SMEM scalar — the packet analogue of the reference's
  shrinking t-interval, ``bvh.rs:165-180``). Every drain round tightens
  it, so late treelets behind the packet's closest surfaces are skipped
  entirely. Rays whose results the caller ignores are flagged invalid in
  the packed column input so they cannot hold the bound at +inf.
- **Column-layout treelet drains.** Hit treelets (128 consecutive leaf
  prims) are collected into a list; rounds of up to DB=8 treelets are
  DMA'd from HBM (8 KB blocks, pipelined) and intersected in a
  (1024 rays, 128 prims) column domain: ray components enter as
  (1024, 1) columns, primitive fields as (1, 128) rows from the block, and
  every op is a full (1024, 128) broadcast — two orders of magnitude more
  data-parallelism per instruction than the per-prim scalar-load form this
  replaced (measured ~78 → ~19 cycles/prim). All math is f32 on the VPU;
  the MXU bf16 path corrupts world-space plane functionals and its 6-pass
  f32 emulation costs more than the broadcasts.
- **On-chip memory bounded at any scene size.** The top TOP_LEVELS levels
  of the complete tree are DMA'd HBM→SMEM once per launch (flat f32 array,
  ~100 KB — SMEM scalar loads measured ~5x faster than VMEM ones for the
  walk); everything below streams from HBM per treelet. This replaced the
  round-2 design that held the whole tree + leaf table in VMEM and
  compile-OOM'd at 262k prims.

The best (t, slot) is carried per *lane* in (1024, 128) scratch and
reduced over lanes once in an XLA epilogue (ties resolve to the smallest
slot, matching the XLA argmin sweep). Winner attributes are NOT emitted
from the drain: TPU row-gather cost is per-row, flat in field count
(measured ~1 ms / 131k rows whether 1 or 25 columns), so the integrator's
single attribute-table fetch is already minimal and extra kernel output
planes only add HBM traffic.

Leaf data layout (built by ``accel.build_kernel_bvh``): one treelet =
tr(=16) leaf rows = 128 prims = one (16, 128) f32 block, prims along lanes:
rows 0-2 n.xyz | 3 d | 4-6 g1.xyz | 7 g1o | 8-10 g2.xyz | 11 g2o |
12 is_tri | 13 valid | 14 slot | 15 pad — the same unified quad/triangle
functional form as ops/pallas_sweep.py (u = o·g1 + t·(d·g1) + g1o).

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
_LANES = 128

# top-tree levels kept in VMEM: treelet roots are the level-(TOP_LEVELS-1)
# nodes, so a treelet = n_leaves/2^(TOP_LEVELS-1) leaf rows (16 at sponza's
# 262k prims = 128 prims = one column block)
TOP_LEVELS = 12
# frontier nodes slab-tested per while-iteration (their reduces overlap)
FB = 8
# treelet DMA pipeline depth / drain round size
DB = 16
# frontier queue capacity: bounded by the top tree's total node count
FQ = 2 * (1 << TOP_LEVELS) + 2 * FB + 8
TL_CAP = (1 << (TOP_LEVELS - 1)) + FB + 8
# rays per pallas_call: full-image callers are chunked so the per-lane
# best planes stay bounded (~260 MB of HBM intermediates per chunk)
RAY_CHUNK = 131072

# drain ray-row window: WIN consecutive sorted rays; N_WIN windows per
# packet, window id N_WIN = whole packet
WIN = 128
N_WIN = BLOCK // WIN

# trace-time ablation knobs for tools/ microbenches (jax.clear_caches()
# after flipping): skip the drain intersects / the treelet DMAs entirely
# to attribute kernel time between walk, DMA and intersect work; skip the
# near-first child ordering to measure its walk cost vs pruning benefit
_DEBUG_SKIP_INTERSECT = False
_DEBUG_SKIP_DMA = False
_DEBUG_NO_PROJ = False


def _bvh_kernel(ox, oy, oz, dx, dy, dz, cols_ref,
                nodes_ref, rows_hbm, out_t_ref, out_s_ref,
                fq_ref, tl_ref, bt_ref, bs_ref,
                tile_ref, sems, smem_nodes, sb_ref, nsem,
                *, n_troots, tr, leaf_size):
    # a treelet = tr leaf rows = tr*leaf_size prims, stored as nbt
    # (16, 128) field-row blocks (prims along lanes, zero-padded)
    nbt = max(1, (tr * leaf_size + _LANES - 1) // _LANES)
    brows = nbt * 16
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])

    # slab-test reciprocals (geo/mod.rs:159-188 precomputes 1/dir once);
    # padding rays have d = 0 -> inv = inf -> NaN/false comparisons -> miss
    invx = 1.0 / d[0]
    invy = 1.0 / d[1]
    invz = 1.0 / d[2]

    bt_ref[...] = jnp.full((BLOCK, _LANES), INF, jnp.float32)
    bs_ref[...] = jnp.full((BLOCK, _LANES), -1.0, jnp.float32)
    fq_ref[0] = jnp.int32(0)

    # The top-tree node table lives in SMEM — the scalar core's native
    # memory — DMA'd from HBM once on the first grid step (scratch persists
    # across grid steps). VMEM scalar loads measured ~5x slower here, and an
    # SMEM *input* window would lane-pad 16x past the 1 MB SMEM budget.
    @pl.when(pl.program_id(0) == 0)
    def _():
        pltpu.make_async_copy(nodes_ref, smem_nodes, nsem).start()
        pltpu.make_async_copy(nodes_ref, smem_nodes, nsem).wait()

    def node_f(n, f):
        return smem_nodes[n * 8 + f]

    # packet mean direction SIGNS (scalars): each pushed child pair is
    # ordered near-first along the parent's SPLIT AXIS (node field 6,
    # recorded by the median-split build) — children separate along that
    # axis by construction, so its sign test gives the same front-to-back
    # order the round-4 kernel got from projecting both child box centers
    # (12 SMEM loads + 12 flops per push) for one SMEM load
    # (bvh.rs:165-180 visits left-first; a packet needs the explicit
    # near-first order so drains tighten the max-t bounds early — skipping
    # it measured 22.9 -> 33.0 ms on divergent wavefronts)
    sx = jnp.sum(d[0])
    sy = jnp.sum(d[1])
    sz = jnp.sum(d[2])

    # column-layout ray components, (1024, 1) lane slices of the packed
    # (1024, 8) [o | d | tmin | valid] input
    cols = cols_ref[...]
    om = (cols[:, 0:1], cols[:, 1:2], cols[:, 2:3])
    dm = (cols[:, 3:4], cols[:, 4:5], cols[:, 5:6])
    tmin = cols[:, 6:7]
    vcol = cols[:, 7:8]

    # Per-ray FAR bound: the ray's exit distance from the root box. No
    # primitive lies beyond it, so a ray that will MISS everything still
    # contributes a finite value to the packet max-t bound — without this,
    # one escaping ray pins the bound at +inf and disables pruning for its
    # whole packet (exactly the open-interior case). Rays outside the box
    # moving away get 0 and constrain nothing.
    def root_far():
        fr = None
        for ax in range(3):
            invc = 1.0 / dm[ax]
            t0 = (node_f(0, ax) - om[ax]) * invc
            t1 = (node_f(0, 3 + ax) - om[ax]) * invc
            far = jnp.maximum(t0, t1)
            fr = far if fr is None else jnp.minimum(fr, far)
        # NaN (zero-direction padding rays) must not poison the packet
        # max: treat as 0 (they are also valid=0-gated)
        fr = jnp.where(fr == fr, fr, 0.0)
        return jnp.maximum(fr, 0.0)

    froot = root_far()

    # per-stripe weights 2^row for stripe bitmasks (stripe == sublane-row
    # of the (8, 128) ray domain when WIN = BLOCK/8)
    assert N_WIN == BLOCK // _LANES and WIN == _LANES
    stripe_w = jnp.left_shift(
        jnp.int32(1),
        jax.lax.broadcasted_iota(jnp.int32, (BLOCK // _LANES, 1), 0))

    def refresh_bounds(per_ray):
        """per_ray (1024, 1) reachable-t -> PER-RAY bound stored (8, 128)
        in the row-major ray layout, so both the walk and the drain
        re-prune compare their (8, 128) ray-domain near values
        ELEMENTWISE: a node/treelet survives for stripe s (= sublane-row
        s) only if some ray in s can individually still reach it. This is
        strictly tighter than the round-4 per-stripe max bound — there,
        one far-flying ray (a miss crossing the whole room) forced drains
        of distant treelets for its entire 128-ray stripe, the dominant
        waste on divergent interior wavefronts. Invalid rays get -inf, so
        they prune everything (and all-parked stripes go all-dead)."""
        gated = jnp.where(vcol > 0.5, per_ray, jnp.float32(-INF))
        sb_ref[...] = gated.reshape(BLOCK // _LANES, _LANES)

    # per-stripe reachable bound, active from the first walk step thanks
    # to the root-box exit bound (a stripe whose rays all escape nearby
    # prunes everything beyond their exits)
    refresh_bounds(froot)

    def _intersect_block(base, wstart, wsize):
        """Intersect all 128 prims of the (16, 128) field block at tile row
        ``base`` against the ray-row window [wstart, wstart+wsize) in one
        (wsize, 128) column domain: ray components are (wsize, 1), prim
        fields (1, 128), every op a full broadcast. Updates the window's
        slice of the per-lane best (t, slot).

        wstart/wsize are STATIC (one of the N_WIN fixed stripes): the
        drain statically unrolls all stripes and predicates each on the
        treelet's [wlo, whi] row range recorded by the walk. With sorted
        rays the range is narrow, so most treelets run 1 stripe — a
        quarter of the packet's vector work."""
        if _DEBUG_SKIP_INTERSECT:
            return

        def rows(ref):
            return ref[wstart:wstart + wsize, :]

        def setrows(ref, v):
            ref[wstart:wstart + wsize, :] = v

        colw = rows(cols_ref)
        omw = (colw[:, 0:1], colw[:, 1:2], colw[:, 2:3])
        dmw = (colw[:, 3:4], colw[:, 4:5], colw[:, 5:6])
        tminw = colw[:, 6:7]
        # field rows follow the unified planar-table column order:
        # 0-2 n | 3 d | 4-6 g1 | 7 g1o | 8-10 g2 | 11 g2o | 12 is_tri |
        # 13 valid | 14 slot
        n0 = tile_ref[pl.ds(base + 0, 1), :]
        n1 = tile_ref[pl.ds(base + 1, 1), :]
        n2 = tile_ref[pl.ds(base + 2, 1), :]
        dpl = tile_ref[pl.ds(base + 3, 1), :]
        g10 = tile_ref[pl.ds(base + 4, 1), :]
        g11 = tile_ref[pl.ds(base + 5, 1), :]
        g12 = tile_ref[pl.ds(base + 6, 1), :]
        g1o = tile_ref[pl.ds(base + 7, 1), :]
        g20 = tile_ref[pl.ds(base + 8, 1), :]
        g21 = tile_ref[pl.ds(base + 9, 1), :]
        g22 = tile_ref[pl.ds(base + 10, 1), :]
        g2o = tile_ref[pl.ds(base + 11, 1), :]
        istri = tile_ref[pl.ds(base + 12, 1), :]
        valid = tile_ref[pl.ds(base + 13, 1), :]
        slotv = tile_ref[pl.ds(base + 14, 1), :]
        # (wsize,1) x (1,128) broadcasts: full-f32 dot products
        on = omw[0] * n0 + omw[1] * n1 + omw[2] * n2
        dn = dmw[0] * n0 + dmw[1] * n1 + dmw[2] * n2
        og1 = omw[0] * g10 + omw[1] * g11 + omw[2] * g12
        dg1 = dmw[0] * g10 + dmw[1] * g11 + dmw[2] * g12
        og2 = omw[0] * g20 + omw[1] * g21 + omw[2] * g22
        dg2 = dmw[0] * g20 + dmw[1] * g21 + dmw[2] * g22
        t_ = (dpl - on) / dn
        u = og1 + t_ * dg1 + g1o
        v = og2 + t_ * dg2 + g2o
        tri = istri > 0.5
        base_ok = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
        contain = base_ok & ((tri & (u + v <= 1.0)) | (~tri & (v <= 1.0)))
        bt = rows(bt_ref)
        ok = ((jnp.abs(dn) >= ALMOST_ZERO) & (valid > 0.5) & contain
              & (t_ >= tminw) & (t_ < bt))
        setrows(bt_ref, jnp.where(ok, t_, bt))
        setrows(bs_ref, jnp.where(
            ok, slotv + jnp.zeros((wsize, _LANES), jnp.float32),
            rows(bs_ref)))

    def drain_round(td, tt):
        """Fetch + intersect up to DB pending treelets (entries td..tt-1).
        Per-entry predication uses matched pl.when pairs around DMA start
        and wait — identical conditions, so semaphores stay balanced.

        Each treelet's box is re-tested against the CURRENT packet max-t
        bound before its DMA is even issued: a treelet enqueued early may
        sit entirely behind surfaces found by later drains, and this
        second look (8 batched slab tests, ~350 cycles) skips both its
        fetch and its ~3.5k-cycle intersect."""
        sb = sb_ref[...]
        live = []
        effs = []
        for k in range(DB):
            packed = tl_ref[jnp.minimum(td + k, tt - 1)]
            tnode = (packed & 0xFFFF) + jnp.int32(n_troots - 1)
            t0 = (node_f(tnode, 0) - o[0]) * invx
            t1 = (node_f(tnode, 3) - o[0]) * invx
            near = jnp.minimum(t0, t1)
            t0 = (node_f(tnode, 1) - o[1]) * invy
            t1 = (node_f(tnode, 4) - o[1]) * invy
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            t0 = (node_f(tnode, 2) - o[2]) * invz
            t1 = (node_f(tnode, 5) - o[2]) * invz
            near = jnp.maximum(near, jnp.minimum(t0, t1))
            near = jnp.maximum(near, 0.0)
            # fresh per-stripe mask against the CURRENT bounds, ANDed
            # with the walk-time stripe set: stripes whose rays have
            # since found closer hits drop out here
            rowany = jnp.max((near < sb).astype(jnp.int32), axis=1,
                             keepdims=True)
            fresh = jnp.sum(rowany * stripe_w)
            eff = (packed >> 16) & fresh
            effs.append(eff)
            live.append((td + k < tt) & (eff > 0))
        if not _DEBUG_SKIP_DMA:
            for k in range(DB):
                @pl.when(live[k])
                def _(k=k):
                    t = tl_ref[td + k] & 0xFFFF
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(t * brows, brows), :],
                        tile_ref.at[pl.ds(k * brows, brows), :],
                        sems.at[k]).start()
            for k in range(DB):
                @pl.when(live[k])
                def _(k=k):
                    t = tl_ref[td + k] & 0xFFFF
                    bits = effs[k]
                    pltpu.make_async_copy(
                        rows_hbm.at[pl.ds(t * brows, brows), :],
                        tile_ref.at[pl.ds(k * brows, brows), :],
                        sems.at[k]).wait()
                    for w in range(N_WIN):
                        @pl.when((bits >> w) & 1 > 0)
                        def _(w=w):
                            for b in range(nbt):
                                _intersect_block(k * brows + b * 16,
                                                 w * WIN, WIN)
        # refresh the per-stripe bounds from the tightened per-lane best
        # (still capped by each ray's root-box exit)
        refresh_bounds(jnp.minimum(
            jnp.min(bt_ref[...], axis=1, keepdims=True), froot))


    def body(carry):
        fh, ft, td, tt = carry
        B = jnp.clip(ft - fh, 0, FB)
        sb = sb_ref[...]
        # --- branchless walk step: FB clamped slab tests ---
        nodes = []
        anyh = []
        wins = []
        for c in range(FB):
            node = fq_ref[jnp.minimum(fh + c, ft - 1)]
            nodes.append(node)
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
            # non-empty interval (strict, like Aabb::hit) that can still
            # beat the packet's worst current best hit
            mask = (near < far) & (near < sb)
            # per-stripe hit bitmask: with WIN = BLOCK/8 a stripe is
            # exactly one sublane-row of this (8, 128) mask, so a lane
            # reduce + a weighted sum give the EXACT set of stripes with
            # hitting rays (no contiguous-hull widening); bit 8 of the
            # weighted sum doubles as the any-hit flag
            rowany = jnp.max(mask.astype(jnp.int32), axis=1, keepdims=True)
            bits = jnp.sum(rowany * stripe_w)
            anyh.append(bits)
            wins.append(bits)
        # --- unconditional appends; pointers advance only for real hits ---
        ft2 = ft
        tt2 = tt
        for c in range(FB):
            node = nodes[c]
            hit_c = jnp.where(jnp.int32(c) < B,
                              (anyh[c] > 0).astype(jnp.int32), 0)
            is_troot = (node >= jnp.int32(n_troots - 1)).astype(jnp.int32)
            push = hit_c * (1 - is_troot)
            enq = hit_c * is_troot
            # near child first (clamped loads: a treelet root's 'children'
            # ids fall outside the top tree; its push count is 0 so the
            # garbage ordering is never consumed)
            n1 = 2 * node + 1
            if _DEBUG_NO_PROJ:
                sw = jnp.int32(0)
            else:
                ax = node_f(node, 6)
                s_ax = jnp.where(ax < 0.5, sx, jnp.where(ax < 1.5, sy, sz))
                sw = (s_ax < 0.0).astype(jnp.int32)
            fq_ref[ft2] = n1 + sw
            fq_ref[ft2 + 1] = n1 + 1 - sw
            tl_ref[tt2] = (node - jnp.int32(n_troots - 1)
                           + (wins[c] << 16))  # stripe bitmask @16
            ft2 = ft2 + 2 * push
            tt2 = tt2 + enq
        fh2 = fh + B
        # --- drain round: full pipeline when >=DB pending, else the tail
        # once the walk is done. The FIRST round fires early (>=4 pending):
        # with near-first ordering those are the packet's closest treelets,
        # and draining them immediately gives every later slab test a real
        # per-ray t-bound instead of the loose root-exit bound ---
        pending = tt2 - td
        do_drain = ((pending >= DB) | ((fh2 >= ft2) & (pending > 0))
                    | ((td == 0) & (pending >= 4)))

        @pl.when(do_drain)
        def _():
            drain_round(td, tt2)

        td2 = jnp.where(do_drain, td + jnp.minimum(pending, jnp.int32(DB)),
                        td)
        return fh2, ft2, td2, tt2

    jax.lax.while_loop(
        lambda c: (c[1] > c[0]) | (c[3] > c[2]), body,
        (jnp.int32(0), jnp.int32(1), jnp.int32(0), jnp.int32(0)))

    # emit the raw per-lane best planes; the caller's XLA epilogue does the
    # lane reduction in standard row-major layout (an in-kernel (1024,1)
    # column output forces relayouts in every downstream op)
    out_t_ref[...] = bt_ref[...]
    out_s_ref[...] = bs_ref[...]


def _bvh_chunk(kbvh, cols, interpret):
    """One pallas_call over <= RAY_CHUNK rays (packed as (r, 8)
    [o | d | tmin | valid] columns) + its XLA lane-reduction epilogue.
    Returns (t, slot) of length r. The row-major (rows, 128) component
    planes the walk consumes are derived from the packed columns, so
    sorted callers permute ONE array (row-gather cost is flat in row
    width) instead of eight."""
    r = cols.shape[0]
    n_pad = (r + BLOCK - 1) // BLOCK * BLOCK
    pad = n_pad - r
    cols = jnp.pad(cols, ((0, pad), (0, 0)))

    def prep_row(i):
        return cols[:, i].reshape(n_pad // _LANES, _LANES)

    ox, oy, oz = prep_row(0), prep_row(1), prep_row(2)
    dx, dy, dz = prep_row(3), prep_row(4), prep_row(5)

    grid = (n_pad // BLOCK,)
    row_spec = pl.BlockSpec((BLOCK // _LANES, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    cols_spec = pl.BlockSpec((BLOCK, 8), lambda i: (i, 0),
                             memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((BLOCK, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    top_spec = pl.BlockSpec(memory_space=pl.ANY)
    hbm_spec = pl.BlockSpec(memory_space=pl.ANY)

    out = pl.pallas_call(
        functools.partial(_bvh_kernel, n_troots=kbvh.n_troots, tr=kbvh.tr,
                          leaf_size=kbvh.leaf_size),
        grid=grid,
        in_specs=[row_spec] * 6 + [cols_spec, top_spec, hbm_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, _LANES), jnp.float32)),
        scratch_shapes=[pltpu.SMEM((FQ,), jnp.int32),
                        pltpu.SMEM((TL_CAP,), jnp.int32),
                        pltpu.VMEM((BLOCK, _LANES), jnp.float32),
                        pltpu.VMEM((BLOCK, _LANES), jnp.float32),
                        pltpu.VMEM((DB * max(1, (kbvh.tr * kbvh.leaf_size
                                                 + _LANES - 1) // _LANES)
                                    * 16, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA((DB,)),
                        pltpu.SMEM((kbvh.top_nodes.shape[0]
                                    * kbvh.top_nodes.shape[1],),
                                   jnp.float32),
                        pltpu.VMEM((BLOCK // _LANES, _LANES), jnp.float32),
                        pltpu.SemaphoreType.DMA(())],
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, cols, kbvh.top_nodes.reshape(-1),
      kbvh.rows)
    bt, bs = out
    # lane reduction epilogue (XLA, row-major): ties resolve to the smallest
    # slot, matching the argmin semantics of the XLA sweep
    t = jnp.min(bt, axis=1)
    sl = jnp.min(jnp.where(bt <= t[:, None], bs, jnp.float32(2**30)), axis=1)
    sl = jnp.where(jnp.isfinite(t), sl, -1.0)
    return t[:r], sl[:r].astype(jnp.int32)


def _spread_bits(v):
    """Interleave the low 8 bits of v with two zero bits (Morton):
    bit i moves to bit 3i (masks kept within int32 range)."""
    v = (v | (v << 8)) & jnp.int32(0x0F00F)
    v = (v | (v << 4)) & jnp.int32(0xC30C3)
    v = (v | (v << 2)) & jnp.int32(0x249249)
    return v


def _ray_sort_key(kbvh, oc, dc, validb, bits, mode="octant"):
    """Packet-coherence sort key: origin Morton cell (``bits`` bits/axis over
    the scene root box) then direction octant. Rays sharing a cell+octant form
    a narrow frustum whose treelet working set is small — the difference
    between ~5 ms and ~250 ms per 131k-ray launch on divergent interior
    bounces (measured). Parked rays (zero direction) key to the end so
    they compact into all-dead packets the kernel skips outright.

    mode="dirbin" additionally quantizes the direction SHAPE (the
    normalized |dx|, |dy| barycentric components, sign already in the
    octant) to 2 bits each between the octant and the Morton cell: a
    stripe then holds a ~25-degree direction cone from a compact region
    instead of a full octant."""
    rootmin = kbvh.top_nodes[0, 0:3]
    rootmax = kbvh.top_nodes[0, 3:6]
    m = jnp.int32(0)
    for i in range(3):
        ext = jnp.maximum(rootmax[i] - rootmin[i], 1e-6)
        q = jnp.clip((oc[i] - rootmin[i]) / ext * (1 << bits), 0.0,
                     float((1 << bits) - 1)).astype(jnp.int32)
        m = m | (_spread_bits(q) << (2 - i))
    octant = ((dc[0] < 0).astype(jnp.int32) * 4
              + (dc[1] < 0).astype(jnp.int32) * 2
              + (dc[2] < 0).astype(jnp.int32))
    # octant-major: each 128-ray stripe then holds one direction octant
    # from a compact region — the narrowest per-stripe frustum (measured
    # 1.53 -> 1.63 Mrays/s end to end vs cell-major)
    if mode == "dirbin":
        ax, ay, az = jnp.abs(dc[0]), jnp.abs(dc[1]), jnp.abs(dc[2])
        s = jnp.maximum(ax + ay + az, 1e-30)
        bx = jnp.minimum((ax / s * 4.0).astype(jnp.int32), 3)
        by = jnp.minimum((ay / s * 4.0).astype(jnp.int32), 3)
        key = ((octant << (3 * bits + 4)) | (bx << (3 * bits + 2))
               | (by << (3 * bits)) | m)
    else:
        key = (octant << (3 * bits)) | m
    return jnp.where(validb > 0.0, key, jnp.int32(1 << 30))


def _ray_sort_enabled():
    import os

    return os.environ.get("SOLSTRALE_RAYSORT", "1") != "0"


def bvh_planar_hit_pallas(kbvh, o, d, tmin, interpret=False):
    """Closest planar hit via packet BVH traversal. Returns (t, slot) with
    slot an index into the unified planar table (Solids.pl_*), -1 on miss
    (t = INF).

    Large wavefronts are re-ordered by a (origin-cell, direction-octant)
    key before packetization and the results inverse-permuted — pure
    arithmetic + one sort, bit-identical results, and the packet working
    sets stay narrow even for fully divergent bounce wavefronts."""
    # the sort flag/bits must resolve OUTSIDE jit (env reads inside a jitted
    # function are baked into the first-traced program); _spread_bits only
    # interleaves 8 bits, so larger values would silently collide keys
    import os

    from .detached import detached_call

    bits = min(int(os.environ.get("SOLSTRALE_SORT_BITS", "6")), 8)
    mode = os.environ.get("SOLSTRALE_SORT_KEY", "octant")
    # detached geometry: the kernel has no AD rule; the zero-backward
    # custom_vjp matches the XLA path's gradients for every differentiated
    # parameter (see ops/detached.py)
    return detached_call(_bvh_planar_hit, kbvh, o, d, tmin,
                         interpret=interpret, sort=_ray_sort_enabled(),
                         sort_bits=bits, sort_mode=mode)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "sort", "sort_bits",
                                    "sort_mode"))
def _bvh_planar_hit(kbvh, o, d, tmin, interpret, sort, sort_bits=6,
                    sort_mode="octant"):
    # o, d: (R, 3) arrays or SoA component tuples (the integrator's native
    # form — avoids column extracts on the hot path)
    oc = o if isinstance(o, tuple) else (o[:, 0], o[:, 1], o[:, 2])
    dc = d if isinstance(d, tuple) else (d[:, 0], d[:, 1], d[:, 2])
    r = oc[0].shape[0]
    # a ray is 'valid' for the packet max-t bound iff it can have a
    # consumer: zero-direction rays (padding / parked lanes) cannot
    validb = ((dc[0] != 0.0) | (dc[1] != 0.0)
              | (dc[2] != 0.0)).astype(jnp.float32)

    tminb = jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,))
    cols = jnp.stack(list(oc) + list(dc) + [tminb, validb], axis=1)
    order = None
    if r >= 4 * BLOCK and sort:
        key = _ray_sort_key(kbvh, oc, dc, validb, sort_bits, sort_mode)
        order = jnp.argsort(key)
        cols = cols[order]          # ONE row-gather for all 8 components

    if r <= RAY_CHUNK:
        t, sl = _bvh_chunk(kbvh, cols, interpret)
    else:
        parts = [
            _bvh_chunk(kbvh, cols[a:a + RAY_CHUNK], interpret)
            for a in range(0, r, RAY_CHUNK)
        ]
        t, sl = (jnp.concatenate([p[k] for p in parts]) for k in range(2))
    if order is not None:
        inv = jnp.zeros_like(order).at[order].set(
            jnp.arange(r, dtype=order.dtype))
        t = t[inv]
        sl = sl[inv]
    return t, sl


def bvh_closest_hit_pallas(kbvh, solids, o, d, tmin, tmax, interpret=False):
    """Drop-in for ops.intersect.closest_solid_hit on BVH scenes: packet
    BVH over planar prims + brute sphere sweep, min-combined.
    Returns (t, kind, idx)."""
    from ..scene.compile import KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE
    from .pallas_sweep import closest_hit_pallas

    t_p, pslot = bvh_planar_hit_pallas(kbvh, o, d, tmin,
                                       interpret=interpret)
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
