"""Pallas TPU kernel: fused closest-hit sweep.

One kernel invocation intersects a block of 1024 rays ((8,128) VPU lanes)
against the whole scene — sphere table + unified planar table — entirely in
VMEM, with the running (best_t, best_slot) carried in registers. Compared
with the XLA sweep (ops/intersect.py) this fuses the full primitive loop
into one pass with no (R,P) intermediates.

The kernel is correctness-tested in interpreter mode on CPU
(tests/test_pallas.py) and benchmarked standalone on TPU
(tools/bench_pallas.py); the integrator can route through it via
closest_solid_hit_pallas.

Prim table layouts (f32):
- spheres  (S, 8):  cx cy cz radius valid _ _ _
- planar  (P, 16):  nx ny nz dpl  g1x g1y g1z g1o  g2x g2y g2z g2o
                    is_tri valid _ _
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
_UNROLL = 8


def _unrolled_fori(lo, hi, body, carry, unroll=_UNROLL):
    """fori_loop with the body manually unrolled ``unroll`` times (this
    Pallas version only supports unroll<=2 natively). lo/hi are Python ints;
    the remainder iterations are peeled at trace time."""
    n = hi - lo
    n_main = n // unroll * unroll

    def chunk(i, carry):
        p = lo + i * unroll
        for j in range(unroll):
            carry = body(p + j, carry)
        return carry

    carry = jax.lax.fori_loop(0, n_main // unroll, chunk, carry)
    for p in range(lo + n_main, hi):
        carry = body(jnp.int32(p), carry)
    return carry


def _sweep_kernel(ox, oy, oz, dx, dy, dz, tmin_ref, tmax_ref,
                  sph_ref, pl_ref, out_t, out_slot, *, n_sph, n_pl):
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    tmin = tmin_ref[...]
    tmax = tmax_ref[...]

    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    od = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
    oo = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]

    # blocks whose every lane is parked (zero direction — the work-queue
    # drain tail) skip the whole sweep: outputs pre-set to miss
    out_t[...] = jnp.full_like(tmax, INF)
    out_slot[...] = jnp.full(tmax.shape, -1, jnp.int32)
    alive = jnp.max((dd > 0.0).astype(jnp.int32))

    @pl.when(alive > 0)
    def _sweep():
        _sweep_live(o, d, tmin, tmax, dd, od, oo, sph_ref, pl_ref,
                    out_t, out_slot, n_sph=n_sph, n_pl=n_pl)


def _sweep_live(o, d, tmin, tmax, dd, od, oo, sph_ref, pl_ref,
                out_t, out_slot, *, n_sph, n_pl):

    best_t = jnp.full_like(tmax, INF)
    # slot carried as f32: Mosaic cannot legalize int-vector selects with
    # scalar operands on all generations
    best_slot = jnp.full(tmax.shape, -1.0, jnp.float32)

    def sphere_body(p, carry):
        best_t, best_slot = carry
        cx = sph_ref[p, 0]
        cy = sph_ref[p, 1]
        cz = sph_ref[p, 2]
        radius = sph_ref[p, 3]
        valid = sph_ref[p, 4]
        # oc·d / |oc|² expanded around precomputed per-ray scalars
        cd = cx * d[0] + cy * d[1] + cz * d[2]
        co = cx * o[0] + cy * o[1] + cz * o[2]
        half_b = od - cd
        c2 = oo - 2.0 * co + (cx * cx + cy * cy + cz * cz) - radius * radius
        disc = half_b * half_b - dd * c2
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        r1 = (-half_b - sq) / dd
        r2 = (-half_b + sq) / dd
        ok = (disc >= 0.0) & (valid > 0.5)
        t = jnp.where(ok & (r1 >= tmin) & (r1 <= tmax), r1,
                      jnp.where(ok & (r2 >= tmin) & (r2 <= tmax), r2, INF))
        better = t < best_t
        slot_val = jnp.full_like(best_slot, p.astype(jnp.float32))
        return (jnp.where(better, t, best_t),
                jnp.where(better, slot_val, best_slot))

    best_t, best_slot = _unrolled_fori(0, n_sph, sphere_body,
                                       (best_t, best_slot))

    def planar_body(p, carry):
        best_t, best_slot = carry
        nx = pl_ref[p, 0]
        ny = pl_ref[p, 1]
        nz = pl_ref[p, 2]
        dpl = pl_ref[p, 3]
        denom = nx * d[0] + ny * d[1] + nz * d[2]
        t = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
        hx = o[0] + t * d[0]
        hy = o[1] + t * d[1]
        hz = o[2] + t * d[2]
        u = hx * pl_ref[p, 4] + hy * pl_ref[p, 5] + hz * pl_ref[p, 6] \
            + pl_ref[p, 7]
        v = hx * pl_ref[p, 8] + hy * pl_ref[p, 9] + hz * pl_ref[p, 10] \
            + pl_ref[p, 11]
        is_tri = pl_ref[p, 12] > 0.5
        valid = pl_ref[p, 13] > 0.5
        # boolean select via logical ops (Mosaic cannot legalize i1 selects)
        base = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
        contain = base & ((is_tri & (u + v <= 1.0))
                          | (~is_tri & (v <= 1.0)))
        ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
              & (t >= tmin) & (t <= tmax) & (t < best_t))
        slot_val = jnp.full_like(best_slot, (n_sph + p).astype(jnp.float32))
        return (jnp.where(ok, t, best_t),
                jnp.where(ok, slot_val, best_slot))

    best_t, best_slot = _unrolled_fori(0, n_pl, planar_body,
                                       (best_t, best_slot))

    out_t[...] = best_t
    out_slot[...] = best_slot.astype(jnp.int32)


def _pack_tables(solids):
    """Device-side packing of Solids → kernel prim tables (cheap concats,
    hoisted by jit)."""
    s = solids
    sph = jnp.concatenate([
        s.sph_center, s.sph_radius[:, None],
        s.sph_valid.astype(jnp.float32)[:, None],
        jnp.zeros((s.sph_center.shape[0], 3), jnp.float32)], axis=1)
    pln = jnp.concatenate([
        s.pl_n, s.pl_d[:, None], s.pl_g1, s.pl_g1o[:, None],
        s.pl_g2, s.pl_g2o[:, None],
        s.pl_is_tri.astype(jnp.float32)[:, None],
        s.pl_valid.astype(jnp.float32)[:, None],
        jnp.zeros((s.pl_n.shape[0], 2), jnp.float32)], axis=1)
    return sph, pln


@functools.partial(jax.jit, static_argnames=("spheres_only", "interpret"))
def closest_hit_pallas(solids, o, d, tmin, tmax, spheres_only=False,
                       interpret=False):
    """Pallas-fused closest hit. Returns (t, slot) with slot < S for
    spheres, S+planar_slot otherwise, -1 on miss (t=INF).

    spheres_only=True skips the planar sweep (used by the BVH fast path,
    which traverses planar prims itself — ops/pallas_bvh.py).
    o, d: (R, 3) arrays or SoA component tuples."""
    oc = o if isinstance(o, tuple) else (o[:, 0], o[:, 1], o[:, 2])
    dc = d if isinstance(d, tuple) else (d[:, 0], d[:, 1], d[:, 2])
    r = oc[0].shape[0]
    n_pad = (r + BLOCK - 1) // BLOCK * BLOCK
    pad = n_pad - r

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(n_pad // _LANES, _LANES)

    ox, oy, oz = (prep(c) for c in oc)
    dx, dy, dz = (prep(c) for c in dc)
    tminb = prep(jnp.broadcast_to(jnp.asarray(tmin, jnp.float32), (r,)))
    tmaxb = prep(jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (r,)))
    # padding rays have zero direction + [0, 0] interval; their results are
    # sliced off below
    sph, pln = _pack_tables(solids)
    if spheres_only:
        pln = jnp.zeros((1, 16), jnp.float32)  # unused dummy (n_pl = 0)
    n_sph = sph.shape[0]
    n_pl = 0 if spheres_only else pln.shape[0]

    grid = (n_pad // BLOCK,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # prim tables live in SMEM: dynamic-indexed scalar loads run on
    # the scalar core, decoupled from (and ahead of) the VPU — 2.1x
    # over VMEM tables measured at 143 prims / 32k rays
    table_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, slot = pl.pallas_call(
        functools.partial(_sweep_kernel, n_sph=n_sph, n_pl=n_pl),
        grid=grid,
        in_specs=[ray_spec] * 8 + [table_spec, table_spec],
        out_specs=(ray_spec,
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tminb, tmaxb, sph, pln)

    return t.reshape(-1)[:r], slot.reshape(-1)[:r]


def _medium_kernel(ox, oy, oz, dx, dy, dz, tsol_ref, u_ref, sph_ref, pl_ref,
                   nid_ref, out_t, *, n_sph, n_pl):
    """Fused constant-medium event test (constant_medium.rs:35-79): entry =
    closest boundary hit on (-inf, inf), exit = closest past entry+1e-4,
    exponential free-flight sample within [entry, exit] clamped to
    [RAY_T_MIN, t_solid]."""
    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])
    t_solid = tsol_ref[...]
    u = u_ref[...]
    neg_inv_density = nid_ref[0]

    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    od = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
    oo = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]

    # all-parked blocks (zero directions, queue drain tail) skip the sweeps
    out_t[...] = jnp.full_like(t_solid, INF)
    alive = jnp.max((dd > 0.0).astype(jnp.int32))

    @pl.when(alive > 0)
    def _medium_live():
        _medium_body(o, d, t_solid, u, neg_inv_density, dd, od, oo,
                     sph_ref, pl_ref, out_t, n_sph=n_sph, n_pl=n_pl)


def _medium_body(o, d, t_solid, u, neg_inv_density, dd, od, oo,
                 sph_ref, pl_ref, out_t, *, n_sph, n_pl):

    def closest(lo):
        best = jnp.full_like(t_solid, INF)

        def sph_body(p, best):
            cx = sph_ref[p, 0]
            cy = sph_ref[p, 1]
            cz = sph_ref[p, 2]
            radius = sph_ref[p, 3]
            valid = sph_ref[p, 4]
            cd = cx * d[0] + cy * d[1] + cz * d[2]
            co = cx * o[0] + cy * o[1] + cz * o[2]
            half_b = od - cd
            c2 = oo - 2.0 * co + (cx * cx + cy * cy + cz * cz) \
                - radius * radius
            disc = half_b * half_b - dd * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = (-half_b - sq) / dd
            r2 = (-half_b + sq) / dd
            ok = (disc >= 0.0) & (valid > 0.5)
            t = jnp.where(ok & (r1 >= lo), r1,
                          jnp.where(ok & (r2 >= lo), r2, INF))
            return jnp.where(t < best, t, best)

        best = _unrolled_fori(0, n_sph, sph_body, best)

        def pl_body(p, best):
            nx = pl_ref[p, 0]
            ny = pl_ref[p, 1]
            nz = pl_ref[p, 2]
            dpl = pl_ref[p, 3]
            denom = nx * d[0] + ny * d[1] + nz * d[2]
            t = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
            hx = o[0] + t * d[0]
            hy = o[1] + t * d[1]
            hz = o[2] + t * d[2]
            uu = hx * pl_ref[p, 4] + hy * pl_ref[p, 5] + hz * pl_ref[p, 6] \
                + pl_ref[p, 7]
            vv = hx * pl_ref[p, 8] + hy * pl_ref[p, 9] + hz * pl_ref[p, 10] \
                + pl_ref[p, 11]
            is_tri = pl_ref[p, 12] > 0.5
            valid = pl_ref[p, 13] > 0.5
            base = (uu >= 0.0) & (uu <= 1.0) & (vv >= 0.0)
            contain = base & ((is_tri & (uu + vv <= 1.0))
                              | (~is_tri & (vv <= 1.0)))
            ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
                  & (t >= lo) & (t < best))
            return jnp.where(ok, t, best)

        return _unrolled_fori(0, n_pl, pl_body, best)

    neg_big = jnp.full_like(t_solid, -INF)
    t1 = closest(neg_big)
    t2 = closest(t1 + 1e-4)
    both = (t1 < INF) & (t2 < INF)

    t1c = jnp.maximum(t1, 1e-3)   # RAY_T_MIN
    t2c = jnp.minimum(t2, t_solid)
    ordered = t1c < t2c
    t1c = jnp.maximum(t1c, 0.0)
    r_len = jnp.sqrt(dd)
    dist_inside = (t2c - t1c) * r_len
    hit_dist = neg_inv_density * jnp.log(jnp.maximum(u, 1e-38))
    scatters = hit_dist <= dist_inside
    t = t1c + hit_dist / r_len
    out_t[...] = jnp.where(both & ordered & scatters, t, INF)


@functools.partial(jax.jit, static_argnames=("interpret",))
def medium_hit_pallas(medium, o, d, t_solid, u_flight, interpret=False):
    """Fused medium event test via one Pallas kernel per medium."""
    r = o.shape[0]
    n_pad = (r + BLOCK - 1) // BLOCK * BLOCK
    pad = n_pad - r

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(n_pad // _LANES, _LANES)

    ox, oy, oz = (prep(o[:, i]) for i in range(3))
    dx, dy, dz = (prep(d[:, i]) for i in range(3))
    tsol = prep(jnp.where(jnp.isfinite(t_solid), t_solid, INF))
    uf = prep(u_flight)
    sph, pln = _pack_tables(medium.boundary)
    nid = jnp.reshape(medium.neg_inv_density, (1,)).astype(jnp.float32)

    grid = (n_pad // BLOCK,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # prim tables live in SMEM: dynamic-indexed scalar loads run on
    # the scalar core, decoupled from (and ahead of) the VPU — 2.1x
    # over VMEM tables measured at 143 prims / 32k rays
    table_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t = pl.pallas_call(
        functools.partial(_medium_kernel, n_sph=sph.shape[0],
                          n_pl=pln.shape[0]),
        grid=grid,
        in_specs=[ray_spec] * 8 + [table_spec, table_spec, scalar_spec],
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                       jnp.float32),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, tsol, uf, sph, pln, nid)
    return t.reshape(-1)[:r]


def _scene_hit_kernel(ox, oy, oz, dx, dy, dz, *rest, n_sph, n_pl, media_np,
                      tmin, tmax):
    """Whole scene_hit in ONE kernel: closest solid hit (sphere + planar
    tables) plus every constant-medium event test (entry/exit boundary hits
    + exponential free flight, constant_medium.rs:35-79). Output slot
    encodes: [0, n_sph) sphere, [n_sph, n_sph+n_pl) planar,
    n_sph+n_pl+m for medium m, -1 miss."""
    n_media = len(media_np)
    u_refs = rest[:n_media]
    sph_ref, pl_ref = rest[n_media:n_media + 2]
    med_tabs = rest[n_media + 2:n_media + 2 + 2 * n_media]
    nid_ref = rest[n_media + 2 + 2 * n_media]
    out_t, out_slot = rest[-2:]

    o = (ox[...], oy[...], oz[...])
    d = (dx[...], dy[...], dz[...])

    dd = d[0] * d[0] + d[1] * d[1] + d[2] * d[2]
    od = o[0] * d[0] + o[1] * d[1] + o[2] * d[2]
    oo = o[0] * o[0] + o[1] * o[1] + o[2] * o[2]

    # all-parked blocks (zero directions, queue drain tail) skip everything
    out_t[...] = jnp.full_like(dd, INF)
    out_slot[...] = jnp.full(dd.shape, -1, jnp.int32)
    alive = jnp.max((dd > 0.0).astype(jnp.int32))

    @pl.when(alive > 0)
    def _scene_live():
        _scene_hit_body(o, d, dd, od, oo, u_refs, sph_ref, pl_ref,
                        med_tabs, nid_ref, out_t, out_slot, n_sph=n_sph,
                        n_pl=n_pl, media_np=media_np, tmin=tmin)


def _scene_hit_body(o, d, dd, od, oo, u_refs, sph_ref, pl_ref, med_tabs,
                    nid_ref, out_t, out_slot, *, n_sph, n_pl, media_np,
                    tmin):
    def sweep(sph_t, pl_t, ns, np_, lo, hi, best0, slot0, with_slot,
              slot_base):
        def sph_body(p, carry):
            best, slot = carry
            cx = sph_t[p, 0]
            cy = sph_t[p, 1]
            cz = sph_t[p, 2]
            radius = sph_t[p, 3]
            valid = sph_t[p, 4]
            cd = cx * d[0] + cy * d[1] + cz * d[2]
            co = cx * o[0] + cy * o[1] + cz * o[2]
            half_b = od - cd
            c2 = oo - 2.0 * co + (cx * cx + cy * cy + cz * cz) \
                - radius * radius
            disc = half_b * half_b - dd * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = (-half_b - sq) / dd
            r2 = (-half_b + sq) / dd
            ok = (disc >= 0.0) & (valid > 0.5)
            t = jnp.where(ok & (r1 >= lo) & (r1 <= hi), r1,
                          jnp.where(ok & (r2 >= lo) & (r2 <= hi), r2, INF))
            better = t < best
            best = jnp.where(better, t, best)
            if with_slot:
                sv = jnp.full_like(slot, (slot_base + p).astype(jnp.float32))
                slot = jnp.where(better, sv, slot)
            return best, slot

        def pl_body(p, carry):
            best, slot = carry
            nx = pl_t[p, 0]
            ny = pl_t[p, 1]
            nz = pl_t[p, 2]
            dpl = pl_t[p, 3]
            denom = nx * d[0] + ny * d[1] + nz * d[2]
            t = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
            hx = o[0] + t * d[0]
            hy = o[1] + t * d[1]
            hz = o[2] + t * d[2]
            u = hx * pl_t[p, 4] + hy * pl_t[p, 5] + hz * pl_t[p, 6] \
                + pl_t[p, 7]
            v = hx * pl_t[p, 8] + hy * pl_t[p, 9] + hz * pl_t[p, 10] \
                + pl_t[p, 11]
            is_tri = pl_t[p, 12] > 0.5
            valid = pl_t[p, 13] > 0.5
            base = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
            contain = base & ((is_tri & (u + v <= 1.0))
                              | (~is_tri & (v <= 1.0)))
            ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
                  & (t >= lo) & (t <= hi) & (t < best))
            best = jnp.where(ok, t, best)
            if with_slot:
                sv = jnp.full_like(slot,
                                   (slot_base + ns + p).astype(jnp.float32))
                slot = jnp.where(ok, sv, slot)
            return best, slot

        carry = _unrolled_fori(0, ns, sph_body, (best0, slot0))
        return _unrolled_fori(0, np_, pl_body, carry)

    inf_hi = jnp.full_like(dd, INF)
    best_t, best_slot = sweep(
        sph_ref, pl_ref, n_sph, n_pl, jnp.full_like(dd, tmin), inf_hi,
        jnp.full_like(dd, INF), jnp.full(dd.shape, -1.0, jnp.float32),
        True, jnp.int32(0))

    r_len = jnp.sqrt(dd)
    for m_i, (msph_n, mpl_n) in enumerate(media_np):
        msph = med_tabs[2 * m_i]
        mpl = med_tabs[2 * m_i + 1]
        u = u_refs[m_i][...]
        neg_inv_density = nid_ref[m_i]
        neg_big = jnp.full_like(dd, -INF)
        t1, _ = sweep(msph, mpl, msph_n, mpl_n, neg_big, inf_hi,
                      jnp.full_like(dd, INF), best_slot, False, jnp.int32(0))
        t2, _ = sweep(msph, mpl, msph_n, mpl_n, t1 + 1e-4, inf_hi,
                      jnp.full_like(dd, INF), best_slot, False, jnp.int32(0))
        both = (t1 < INF) & (t2 < INF)
        t1c = jnp.maximum(t1, tmin)
        t2c = jnp.minimum(t2, best_t)
        ordered = t1c < t2c
        t1c = jnp.maximum(t1c, 0.0)
        dist_inside = (t2c - t1c) * r_len
        hit_dist = neg_inv_density * jnp.log(jnp.maximum(u, 1e-38))
        scatters = hit_dist <= dist_inside
        t_m = t1c + hit_dist / r_len
        is_med = both & ordered & scatters & (t_m < best_t)
        best_t = jnp.where(is_med, t_m, best_t)
        slot_m = jnp.float32(n_sph + n_pl + m_i)
        best_slot = jnp.where(is_med, jnp.full_like(best_slot, slot_m),
                              best_slot)

    out_t[...] = best_t
    out_slot[...] = best_slot.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tmin", "interpret"))
def scene_hit_pallas(solids, media, o, d, u_flights, tmin=1e-3,
                     interpret=False):
    """Fused whole-scene hit: one Pallas launch for the solid sweep + all
    constant-medium event tests. Returns (t, slot); slot >= n_sph+n_pl
    means medium (slot - n_sph - n_pl), -1 means miss (t = INF).

    u_flights: tuple of per-medium (R,) free-flight uniforms.
    o, d: (R, 3) arrays or SoA component tuples."""
    oc = o if isinstance(o, tuple) else (o[:, 0], o[:, 1], o[:, 2])
    dc = d if isinstance(d, tuple) else (d[:, 0], d[:, 1], d[:, 2])
    r = oc[0].shape[0]
    n_pad = (r + BLOCK - 1) // BLOCK * BLOCK
    pad = n_pad - r

    def prep(x):
        x = jnp.pad(x, ((0, pad),))
        return x.reshape(n_pad // _LANES, _LANES)

    ox, oy, oz = (prep(c) for c in oc)
    dx, dy, dz = (prep(c) for c in dc)
    sph, pln = _pack_tables(solids)
    n_sph = sph.shape[0]
    n_pl = pln.shape[0]

    u_blocks = tuple(prep(u) for u in u_flights)
    med_tabs = []
    media_np = []
    nids = []
    for med in media:
        msph, mpl = _pack_tables(med.boundary)
        med_tabs += [msph, mpl]
        media_np.append((msph.shape[0], mpl.shape[0]))
        nids.append(jnp.reshape(med.neg_inv_density, (1,)))
    nid = (jnp.concatenate(nids).astype(jnp.float32) if nids
           else jnp.zeros((1,), jnp.float32))

    grid = (n_pad // BLOCK,)
    ray_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    # prim tables live in SMEM: dynamic-indexed scalar loads run on
    # the scalar core, decoupled from (and ahead of) the VPU — 2.1x
    # over VMEM tables measured at 143 prims / 32k rays
    table_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    scalar_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

    t, slot = pl.pallas_call(
        functools.partial(_scene_hit_kernel, n_sph=n_sph, n_pl=n_pl,
                          media_np=tuple(media_np), tmin=tmin, tmax=INF),
        grid=grid,
        in_specs=([ray_spec] * (6 + len(media)) + [table_spec] * 2
                  + [table_spec] * len(med_tabs) + [scalar_spec]),
        out_specs=(ray_spec,
                   pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=(jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_pad // _LANES, _LANES),
                                        jnp.int32)),
        interpret=interpret,
    )(ox, oy, oz, dx, dy, dz, *u_blocks, sph, pln, *med_tabs, nid)

    return t.reshape(-1)[:r], slot.reshape(-1)[:r]


def scene_hit_fused(cs, o, d, u_flights, tmin, interpret=False):
    """Drop-in scene_hit via the fused kernel: returns (t, kind, idx) with
    kind=KIND_MEDIUM and idx=medium index for volume scattering events."""
    from ..scene.compile import (KIND_MEDIUM, KIND_QUAD, KIND_SPHERE,
                                 KIND_TRIANGLE)

    from .detached import detached_call

    t, slot = detached_call(scene_hit_pallas, cs.solids, cs.media, o, d,
                            tuple(u_flights), tmin=tmin, interpret=interpret)
    n_sph = cs.solids.sph_center.shape[0]
    n_pl = cs.solids.pl_idx.shape[0]
    is_sphere = slot < n_sph
    is_med = slot >= n_sph + n_pl
    pslot = jnp.clip(slot - n_sph, 0, n_pl - 1)
    kind = jnp.where(is_med, KIND_MEDIUM,
                     jnp.where(is_sphere, KIND_SPHERE,
                               jnp.where(cs.solids.pl_is_tri[pslot],
                                         KIND_TRIANGLE, KIND_QUAD)))
    idx = jnp.where(is_med, slot - n_sph - n_pl,
                    jnp.where(is_sphere, jnp.maximum(slot, 0),
                              cs.solids.pl_idx[pslot]))
    return t, kind.astype(jnp.int32), idx.astype(jnp.int32)


def closest_solid_hit_pallas(solids, o, d, tmin, tmax, interpret=False):
    """Drop-in for ops.intersect.closest_solid_hit via the Pallas kernel:
    returns (t, kind, idx)."""
    from ..scene.compile import KIND_QUAD, KIND_SPHERE, KIND_TRIANGLE
    from .detached import detached_call

    t, slot = detached_call(closest_hit_pallas, solids, o, d, tmin, tmax,
                            interpret=interpret)
    n_sph = solids.sph_center.shape[0]
    is_sphere = slot < n_sph
    pslot = jnp.clip(slot - n_sph, 0, solids.pl_idx.shape[0] - 1)
    kind = jnp.where(is_sphere, KIND_SPHERE,
                     jnp.where(solids.pl_is_tri[pslot], KIND_TRIANGLE,
                               KIND_QUAD)).astype(jnp.int32)
    idx = jnp.where(is_sphere, jnp.maximum(slot, 0), solids.pl_idx[pslot])
    return t, kind, idx
