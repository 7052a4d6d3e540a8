"""Pallas TPU render megakernel: the ENTIRE progressive render loop in one
kernel launch.

Round-1 profiling (PERF.md) showed the wavefront integrator's bounce cost
dominated by fixed per-kernel/per-while-iteration dispatch overhead
(~0.5-2 ms under the remote TPU backend) rather than compute. The megakernel
removes every dispatch: one ``pallas_call`` renders a whole sample batch —
camera rays, scene intersection, constant-medium events, material dispatch,
NEE mixture sampling, the forward clamp-fold, accumulation and path
regeneration all run inside a single on-chip loop.

Execution model: the image is cut into 1024-pixel tiles ((8, 128) VPU
lanes); the grid walks tiles. Within a tile, lane i owns pixel
``tile_base + i`` and traces its ``n_samples`` paths back-to-back
(regenerative wavefront): when a path terminates, its contribution folds
into the lane-local accumulator and the lane immediately starts the pixel's
next sample — no cross-lane traffic at all. All randomness is the same
counter-based PCG4D keyed on (pixel, sample, bounce, purpose, seed) as the
host integrator (ops/rng.py), so the megakernel reproduces the wavefront
integrator's estimator draw-for-draw.

Scope (megakernel_supported): solid-color textures, no normal maps, scene
tables small enough for SMEM (prim count <= ~1k; larger scenes use the
packet-BVH path). Semantics mirror renderer/integrator.py one-for-one; the
reference citations live there.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..geo import ALMOST_ZERO, INF
from ..ops import rng as hrng
from ..ops.pallas_sweep import _unrolled_fori

_ROWS = 8
_LANES = 128
TILE = _ROWS * _LANES

_U32 = jnp.uint32


# --- in-kernel counter RNG (bit-identical to ops/rng.py) -------------------

def _pcg4d(a, b, c, d):
    a = a * _U32(1664525) + _U32(1013904223)
    b = b * _U32(1664525) + _U32(1013904223)
    c = c * _U32(1664525) + _U32(1013904223)
    d = d * _U32(1664525) + _U32(1013904223)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    a = a ^ (a >> 16)
    b = b ^ (b >> 16)
    c = c ^ (c >> 16)
    d = d ^ (d >> 16)
    a = a + b * d
    b = b + c * a
    c = c + a * b
    d = d + b * c
    return a, b, c, d


def _to_unit(u):
    # uint32 -> f32 in [0,1): Mosaic lacks u32->f32 casts; the top-24-bit
    # value fits int32 exactly, so bitcast + i32 cast is bit-identical
    return pltpu.bitcast(u >> 8, jnp.int32).astype(jnp.float32) \
        * jnp.float32(1.0 / (1 << 24))


def _uniform4(pix, sample, bounce, purpose, seed):
    """pix/sample/bounce: (8,128) int32; purpose: python int; seed: scalar
    int32."""
    a = pltpu.bitcast(pix, _U32)
    b = pltpu.bitcast(sample, _U32)
    c = pltpu.bitcast((bounce << 8) | jnp.int32(purpose), _U32)
    dd = pltpu.bitcast(jnp.full(pix.shape, seed, jnp.int32), _U32)
    x, y, z, w = _pcg4d(a, b, c, dd)
    return _to_unit(x), _to_unit(y), _to_unit(z), _to_unit(w)


# --- (8,128)-component vector helpers --------------------------------------

def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _scale(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _where(m, a, b):
    return (jnp.where(m, a[0], b[0]), jnp.where(m, a[1], b[1]),
            jnp.where(m, a[2], b[2]))


def _unit(v):
    inv = 1.0 / jnp.sqrt(_dot(v, v))
    return _scale(v, inv)


def _reflect(v, n):
    return _sub(v, _scale(n, 2.0 * _dot(v, n)))


def _refract(v, n, ir):
    cos_t = jnp.minimum(-_dot(v, n), 1.0)
    perp = _scale(_add(_scale(n, cos_t), v), ir)
    par = _scale(n, -jnp.sqrt(jnp.abs(1.0 - _dot(perp, perp))))
    return _add(perp, par)


def _onb_from_w(w):
    uw = _unit(w)
    pick = jnp.abs(uw[0]) > 0.9
    ax = jnp.where(pick, 0.0, 1.0)
    ay = jnp.where(pick, 1.0, 0.0)
    a = (ax, ay, jnp.zeros_like(ax))
    v = _unit(_cross(uw, a))
    u = _cross(uw, v)
    return u, v, uw


def _onb_local(t, b, n, a):
    return _add(_add(_scale(t, a[0]), _scale(b, a[1])), _scale(n, a[2]))


def _unit_vector_sample(r1, r2):
    z = 1.0 - 2.0 * r1
    phi = 2.0 * jnp.pi * r2
    zz = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return (jnp.cos(phi) * zz, jnp.sin(phi) * zz, z)


def _cosine_sample(r1, r2):
    phi = 2.0 * jnp.pi * r1
    rs = jnp.sqrt(r2)
    return (jnp.cos(phi) * rs, jnp.sin(phi) * rs, jnp.sqrt(1.0 - r2))


def _in_unit_sphere(r1, r2, r3):
    d = _unit_vector_sample(r1, r2)
    radius = jnp.exp(jnp.log(jnp.maximum(r3, 1e-12)) / 3.0)
    return _scale(d, radius)


def _in_unit_disc(r1, r2):
    r = jnp.sqrt(r1)
    phi = 2.0 * jnp.pi * r2
    return r * jnp.cos(phi), r * jnp.sin(phi)


def _to_sphere(radius, dist_sq, r1, r2):
    z = 1.0 + r2 * (jnp.sqrt(jnp.maximum(0.0, 1.0 - radius * radius
                                         / dist_sq)) - 1.0)
    phi = 2.0 * jnp.pi * r1
    zz = jnp.sqrt(jnp.maximum(0.0, 1.0 - z * z))
    return (jnp.cos(phi) * zz, jnp.sin(phi) * zz, z)


def _isnan(x):
    return x != x


# --- arctangent family (Mosaic has no acos/atan2 lowering) -----------------
# Cephes-style float32 minimax arctan (max error ~1e-6 rad — the consumers
# are spherical texture uvs, where a half-texel is >=1e-4 for any texture
# up to 16k wide), branch-free via selects.

_PIO2 = 1.5707963705062866
_PIO4 = 0.7853981852531433
_PI = 3.1415927410125732


def _atan_pos(x):
    """arctan for x >= 0 (three-range Cephes reduction)."""
    big = x > 2.414213562373095
    mid = (x > 0.4142135623730950) & ~big
    y0 = jnp.where(big, _PIO2, jnp.where(mid, _PIO4, 0.0))
    safe = jnp.where(big, x, 1.0)
    xt = jnp.where(big, -1.0 / safe,
                   jnp.where(mid, (x - 1.0) / (x + 1.0), x))
    z = xt * xt
    p = ((((8.05374449538e-2 * z - 1.38776856032e-1) * z
           + 1.99777106478e-1) * z - 3.33329491539e-1) * z * xt + xt)
    return y0 + p


def _atan2(y, x):
    """Four-quadrant arctangent; range (-pi, pi]. (atan2(0, 0) returns
    pi/2 instead of 0 — reachable only at exact sphere poles, where the
    reference's uv is equally degenerate.)"""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    base = _atan_pos(ay / jnp.where(ax > 0.0, ax, 1.0))
    base = jnp.where(ax > 0.0, base, _PIO2)
    ang = jnp.where(x >= 0.0, base, _PI - base)
    return jnp.where(y >= 0.0, ang, -ang)


def _acos(x):
    """arccos via atan2(sqrt(1-x^2), x); range [0, pi]."""
    s = jnp.sqrt(jnp.maximum((1.0 - x) * (1.0 + x), 0.0))
    return _atan2(s, x)


# --- the kernel -------------------------------------------------------------

def _render_kernel(scal_ref, cam_ref, sph_ref, pl_ref, mat_ref, tex_ref,
                   light_ref, *rest, n_sph, n_pl, n_mat, n_tex, n_light,
                   media_np, has_blend, arena_words):
    has_image = arena_words > 0
    n_media = len(media_np)
    med_tabs = rest[:2 * n_media]
    k = 2 * n_media
    med_par = None
    if n_media:
        med_par = rest[k]
        k += 1
    if has_image:
        texmeta_ref = rest[k]          # SMEM (Tt, 4): offset w h is_img
        arena_hbm = rest[k + 1]        # ANY (arena_words,) i32 u8-packed
        # kernel arg order: inputs, OUTPUTS, scratches
        out_r, out_g, out_b, seg_ref = rest[k + 2:k + 6]
        (idx_vm, rgb_vm, idx_sm, rgb_sm, arena_sm,
         asem, xsem) = rest[k + 6:k + 13]
    else:
        out_r, out_g, out_b, seg_ref = rest[-4:]

    width_i = scal_ref[0]
    height_i = scal_ref[1]
    sample_start = scal_ref[2]
    n_samples = scal_ref[3]
    max_depth = scal_ref[4]
    seed = scal_ref[5]
    n_pix = scal_ref[6]
    sample_end = sample_start + n_samples

    tile = pl.program_id(0)
    if has_image:
        # u8-packed texture arena -> SMEM once (scratch persists across
        # grid steps); SMEM scalar loads are the only per-lane dynamic
        # fetch the hardware offers (VMEM scalar loads need a static lane)
        @pl.when(pl.program_id(0) == 0)
        def _():
            pltpu.make_async_copy(arena_hbm, arena_sm, asem).start()
            pltpu.make_async_copy(arena_hbm, arena_sm, asem).wait()

    lane = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0) * _LANES
            + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1))
    pix = tile * TILE + lane
    pix_ok = pix < n_pix
    pixc = jnp.minimum(pix, n_pix - 1)

    wf = width_i.astype(jnp.float32)
    pf = pixc.astype(jnp.float32)
    yq = jnp.floor(pf / wf)
    xf = pf - yq * wf

    def cam_rays(sample):
        j1, j2, _, _ = _uniform4(pixc, sample, jnp.zeros_like(pixc),
                                 hrng.P_JITTER, seed)
        u = (xf + j1) / (wf - 1.0)
        v = (yq + j2) / (height_i.astype(jnp.float32) - 1.0)
        l1, l2, _, _ = _uniform4(pixc, sample, jnp.zeros_like(pixc),
                                 hrng.P_LENS, seed)
        rdx, rdy = _in_unit_disc(l1, l2)
        lr = cam_ref[18]
        has_lens = lr > 0.0
        cu = (cam_ref[12], cam_ref[13], cam_ref[14])
        cv = (cam_ref[15], cam_ref[16], cam_ref[17])
        off = _add(_scale(cu, rdx * lr), _scale(cv, rdy * lr))
        off = (jnp.where(has_lens, off[0], 0.0),
               jnp.where(has_lens, off[1], 0.0),
               jnp.where(has_lens, off[2], 0.0))
        org = (cam_ref[0], cam_ref[1], cam_ref[2])
        o = (org[0] + off[0], org[1] + off[1], org[2] + off[2])
        d = (cam_ref[3] + cam_ref[6] * u + cam_ref[9] * v - org[0] - off[0],
             cam_ref[4] + cam_ref[7] * u + cam_ref[10] * v - org[1] - off[1],
             cam_ref[5] + cam_ref[8] * u + cam_ref[11] * v - org[2] - off[2])
        return o, d

    def sweep_capture(o, d, tmin):
        """Closest solid hit over the SMEM prim tables, capturing the
        winner's (center-or-normal, mat) alongside t."""
        dd = _dot(d, d)
        od = _dot(o, d)
        oo = _dot(o, o)
        best = jnp.full(o[0].shape, INF, jnp.float32)
        zero = jnp.zeros_like(best)
        # nx/cx ny nz mat is_sph [tu tv]
        cap = (zero, zero, zero, zero - 1.0, zero, zero, zero)

        def sph_body(p, carry):
            best, cap = carry
            cx = sph_ref[p, 0]
            cy = sph_ref[p, 1]
            cz = sph_ref[p, 2]
            radius = sph_ref[p, 3]
            valid = sph_ref[p, 4]
            mat = sph_ref[p, 5]
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
            t = jnp.where(ok & (r1 >= tmin), r1,
                          jnp.where(ok & (r2 >= tmin), r2, INF))
            better = t < best
            best = jnp.where(better, t, best)
            cap = (jnp.where(better, cx, cap[0]),
                   jnp.where(better, cy, cap[1]),
                   jnp.where(better, cz, cap[2]),
                   jnp.where(better, mat, cap[3]),
                   jnp.where(better, 1.0, cap[4]),
                   cap[5], cap[6])  # sphere uv derives from the normal
            return best, cap

        best, cap = _unrolled_fori(0, n_sph, sph_body, (best, cap))

        def pl_body(p, carry):
            best, cap = carry
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
            mat = pl_ref[p, 14]
            base = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
            contain = base & ((is_tri & (u + v <= 1.0))
                              | (~is_tri & (v <= 1.0)))
            ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
                  & (t >= tmin) & (t < best))
            best = jnp.where(ok, t, best)
            if has_image:
                # interpolated texture uv (triangle.rs:150-154; quads use
                # identity uv functionals) captured with the winner
                tu = pl_ref[p, 16] + u * pl_ref[p, 18] + v * pl_ref[p, 20]
                tv = pl_ref[p, 17] + u * pl_ref[p, 19] + v * pl_ref[p, 21]
                c5 = jnp.where(ok, tu, cap[5])
                c6 = jnp.where(ok, tv, cap[6])
            else:
                c5, c6 = cap[5], cap[6]
            cap = (jnp.where(ok, nx, cap[0]),
                   jnp.where(ok, ny, cap[1]),
                   jnp.where(ok, nz, cap[2]),
                   jnp.where(ok, mat, cap[3]),
                   jnp.where(ok, 0.0, cap[4]),
                   c5, c6)
            return best, cap

        return _unrolled_fori(0, n_pl, pl_body, (best, cap))

    def medium_sweep(msph, mpl, ns, npl, o, d, lo):
        """Closest boundary hit on [lo, inf) (no capture)."""
        dd = _dot(d, d)
        od = _dot(o, d)
        oo = _dot(o, o)
        best = jnp.full(o[0].shape, INF, jnp.float32)

        def sph_body(p, best):
            cx = msph[p, 0]
            cy = msph[p, 1]
            cz = msph[p, 2]
            radius = msph[p, 3]
            valid = msph[p, 4]
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

        best = _unrolled_fori(0, ns, sph_body, best)

        def pl_body(p, best):
            nx = mpl[p, 0]
            ny = mpl[p, 1]
            nz = mpl[p, 2]
            dpl = mpl[p, 3]
            denom = nx * d[0] + ny * d[1] + nz * d[2]
            t = (dpl - (nx * o[0] + ny * o[1] + nz * o[2])) / denom
            hx = o[0] + t * d[0]
            hy = o[1] + t * d[1]
            hz = o[2] + t * d[2]
            u = hx * mpl[p, 4] + hy * mpl[p, 5] + hz * mpl[p, 6] + mpl[p, 7]
            v = hx * mpl[p, 8] + hy * mpl[p, 9] + hz * mpl[p, 10] + mpl[p, 11]
            is_tri = mpl[p, 12] > 0.5
            valid = mpl[p, 13] > 0.5
            base = (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
            contain = base & ((is_tri & (u + v <= 1.0))
                              | (~is_tri & (v <= 1.0)))
            ok = ((jnp.abs(denom) >= ALMOST_ZERO) & valid & contain
                  & (t >= lo) & (t < best))
            return jnp.where(ok, t, best)

        return _unrolled_fori(0, npl, pl_body, best)

    def mat_lookup(mid):
        """Masked-row fetch of material params for per-lane mat ids."""
        z = jnp.zeros_like(mid)
        row = dict(kind=z, albedo_tex=z, fuzz=z, ior=z + 1.0, atten=z,
                   blend_factor=z, m1=z, m2=z)
        for m in range(n_mat):
            sel = mid == jnp.float32(m)
            row = dict(
                kind=jnp.where(sel, mat_ref[m, 0], row["kind"]),
                albedo_tex=jnp.where(sel, mat_ref[m, 1], row["albedo_tex"]),
                fuzz=jnp.where(sel, mat_ref[m, 3], row["fuzz"]),
                ior=jnp.where(sel, mat_ref[m, 4], row["ior"]),
                atten=jnp.where(sel, mat_ref[m, 5], row["atten"]),
                blend_factor=jnp.where(sel, mat_ref[m, 6],
                                       row["blend_factor"]),
                m1=jnp.where(sel, mat_ref[m, 7], row["m1"]),
                m2=jnp.where(sel, mat_ref[m, 8], row["m2"]))
        return row

    def tex_lookup(tid):
        z = jnp.zeros_like(tid)
        col = (z, z, z)
        for t in range(n_tex):
            sel = tid == jnp.float32(t)
            col = (jnp.where(sel, tex_ref[t, 0], col[0]),
                   jnp.where(sel, tex_ref[t, 1], col[1]),
                   jnp.where(sel, tex_ref[t, 2], col[2]))
        return col

    # material kind constants (scene/materials.py)
    LAMBERTIAN, METAL, DIELECTRIC, DIFFUSE_LIGHT, ISOTROPIC, BLEND = (
        0.0, 1.0, 2.0, 3.0, 4.0, 5.0)

    def resolve_blend(mid, u4):
        if not has_blend:
            return mid
        for lvl in range(3):  # MAX_BLEND_DEPTH
            row = mat_lookup(mid)
            is_blend = row["kind"] == BLEND
            pick1 = u4[lvl] > row["blend_factor"]
            nxt = jnp.where(pick1, row["m1"], row["m2"])
            mid = jnp.where(is_blend, nxt, mid)
        return mid

    def light_pdf_mean(point, pdir):
        """Mean over lights of per-light pdf (pdf.rs:88-102 semantics)."""
        dd = _dot(pdir, pdir)
        total = jnp.zeros_like(dd)
        for li in range(n_light):
            kind = light_ref[li, 0]
            p0 = (light_ref[li, 1], light_ref[li, 2], light_ref[li, 3])
            p1 = (light_ref[li, 4], light_ref[li, 5], light_ref[li, 6])
            p2 = (light_ref[li, 7], light_ref[li, 8], light_ref[li, 9])
            radius = light_ref[li, 10]
            nrm = (light_ref[li, 11], light_ref[li, 12], light_ref[li, 13])
            dpl = light_ref[li, 14]
            w = (light_ref[li, 15], light_ref[li, 16], light_ref[li, 17])
            area = light_ref[li, 18]

            # sphere pdf (sphere.rs:40-56)
            oc = _sub(point, p0)
            half_b = _dot(oc, pdir)
            c2 = _dot(oc, oc) - radius * radius
            disc = half_b * half_b - dd * c2
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            r1 = (-half_b - sq) / dd
            r2 = (-half_b + sq) / dd
            sph_hit = (disc >= 0.0) & ((r1 >= 1e-3) | (r2 >= 1e-3))
            dist_sq = _dot(oc, oc)
            ctm = jnp.sqrt(1.0 - radius * radius / dist_sq)
            solid = 2.0 * jnp.pi * (1.0 - ctm)
            pdf_sph = jnp.where(sph_hit, 1.0 / solid, 0.0)

            # quad pdf (quad.rs:132-143): p0=q p1=u p2=v
            denom = _dot(nrm, pdir)
            tq = (dpl - _dot(point, nrm)) / denom
            hp = _add(point, _scale(pdir, tq))
            pv = _sub(hp, p0)
            pu = _dot(w, _cross(pv, p2))
            pvv = _dot(w, _cross(p1, pv))
            okq = ((jnp.abs(denom) >= ALMOST_ZERO) & (pu >= 0.0)
                   & (pu <= 1.0) & (pvv >= 0.0) & (pvv <= 1.0)
                   & (tq >= 1e-3))
            tq = jnp.where(okq, tq, INF)

            # triangle pdf (triangle.rs:100-112): p0=v0 p1=e1 p2=e2
            pvec = _cross(pdir, p2)
            det = _dot(p1, pvec)
            invd = 1.0 / det
            tvec = _sub(point, p0)
            qvec = _cross(tvec, p1)
            bu = _dot(tvec, pvec) * invd
            bv = _dot(pdir, qvec) * invd
            tt = _dot(p2, qvec) * invd
            okt = ((jnp.abs(det) >= ALMOST_ZERO) & (bu >= 0.0) & (bu <= 1.0)
                   & (bv >= 0.0) & (bu + bv <= 1.0) & (tt >= 1e-3))
            tt = jnp.where(okt, tt, INF)

            t_pl = jnp.where(kind == 1.0, tq, tt)  # KIND_QUAD = 1
            cos_pl = jnp.abs(_dot(pdir, nrm)) / jnp.sqrt(dd)
            pdf_pl = jnp.where(t_pl < INF,
                               t_pl * t_pl * dd / (cos_pl * area), 0.0)
            total = total + jnp.where(kind == 0.0, pdf_sph, pdf_pl)
        return total * jnp.float32(1.0 / max(n_light, 1))

    def sample_light_dir(point, pick, r1, r2):
        z = jnp.zeros_like(r1)
        kind = z
        p0 = (z, z, z)
        p1 = (z, z, z)
        p2 = (z, z, z)
        radius = z
        for li in range(n_light):
            sel = pick == jnp.float32(li)
            kind = jnp.where(sel, light_ref[li, 0], kind)
            p0 = (jnp.where(sel, light_ref[li, 1], p0[0]),
                  jnp.where(sel, light_ref[li, 2], p0[1]),
                  jnp.where(sel, light_ref[li, 3], p0[2]))
            p1 = (jnp.where(sel, light_ref[li, 4], p1[0]),
                  jnp.where(sel, light_ref[li, 5], p1[1]),
                  jnp.where(sel, light_ref[li, 6], p1[2]))
            p2 = (jnp.where(sel, light_ref[li, 7], p2[0]),
                  jnp.where(sel, light_ref[li, 8], p2[1]),
                  jnp.where(sel, light_ref[li, 9], p2[2]))
            radius = jnp.where(sel, light_ref[li, 10], radius)
        to_c = _sub(p0, point)
        dist_sq = _dot(to_c, to_c)
        tan, bit, nr = _onb_from_w(to_c)
        local = _to_sphere(radius, dist_sq, r1, r2)
        dir_sph = _onb_local(tan, bit, nr, local)
        dir_pl = _sub(_add(p0, _add(_scale(p1, r1), _scale(p2, r2))), point)
        return _where(kind == 0.0, dir_sph, dir_pl)

    if has_image:
        def _arena_fetch(byte0):
            """Per-lane u8 arena fetch: spill the (8,128) byte indices to
            SMEM (via VMEM, DMA), walk them on the scalar core unpacking
            3 bytes each from the SMEM arena words, DMA the rgb planes
            back to VMEM. ~25k scalar cycles per call — only runs when a
            lane actually shades an image texture this bounce."""
            idx_vm[...] = byte0
            pltpu.make_async_copy(idx_vm, idx_sm, xsem).start()
            pltpu.make_async_copy(idx_vm, idx_sm, xsem).wait()

            def lane_body(i, carry):
                r = i // _LANES
                l = i - r * _LANES
                b0 = idx_sm[r, l]
                out = []
                for ch in range(3):
                    bidx = b0 + ch
                    word = arena_sm[bidx >> 2]
                    byte = (word >> ((bidx & 3) * 8)) & 255
                    out.append(byte.astype(jnp.float32)
                               * jnp.float32(1.0 / 255.0))
                rgb_sm[0, r, l] = out[0]
                rgb_sm[1, r, l] = out[1]
                rgb_sm[2, r, l] = out[2]
                return carry

            jax.lax.fori_loop(0, TILE, lane_body, jnp.int32(0))
            pltpu.make_async_copy(rgb_sm, rgb_vm, xsem).start()
            pltpu.make_async_copy(rgb_sm, rgb_vm, xsem).wait()

    # ---------------- the progressive loop ----------------
    zero = jnp.zeros((_ROWS, _LANES), jnp.float32)
    sample0 = jnp.full((_ROWS, _LANES), 1, jnp.int32) * sample_start
    o0, d0 = cam_rays(sample0)

    state = dict(
        n_active=jnp.int32(1),
        sample=sample0,
        bounce=jnp.zeros((_ROWS, _LANES), jnp.int32),
        o=o0, d=d0,
        acc_len=zero,
        A=(zero + 1.0, zero + 1.0, zero + 1.0),
        B=(zero + INF, zero + INF, zero + INF),
        # masks carried as f32 0/1: vector i1 while-carries hit an
        # unsupported i8->i1 truncation in Mosaic
        dead=(zero, zero, zero),
        outer=zero,
        acc=(zero, zero, zero),
        segments=jnp.float32(0.0),
    )

    def cond(st):
        return st["n_active"] > 0

    def body(st):
        sample = st["sample"]
        bounce = st["bounce"]
        o, d = st["o"], st["d"]
        active = (sample < sample_end) & pix_ok

        t, cap = sweep_capture(o, d, jnp.float32(1e-3))
        capx, capy, capz, cmat, is_sph, ctu, ctv = cap

        # constant-medium events (fused, constant_medium.rs:35-79)
        is_med = jnp.zeros_like(t) > 1.0
        med_idx = jnp.zeros_like(t)
        for m_i, (ns_m, npl_m) in enumerate(media_np):
            msph = med_tabs[2 * m_i]
            mpl = med_tabs[2 * m_i + 1]
            u_m, _, _, _ = _uniform4(pixc, sample, bounce, 16 + m_i, seed)
            t1 = medium_sweep(msph, mpl, ns_m, npl_m, o, d,
                              jnp.full_like(t, -INF))
            t2 = medium_sweep(msph, mpl, ns_m, npl_m, o, d, t1 + 1e-4)
            both = (t1 < INF) & (t2 < INF)
            t1c = jnp.maximum(t1, 1e-3)
            t2c = jnp.minimum(t2, t)
            ordered = t1c < t2c
            t1c = jnp.maximum(t1c, 0.0)
            r_len = jnp.sqrt(_dot(d, d))
            dist_inside = (t2c - t1c) * r_len
            hit_dist = med_par[m_i, 0] * jnp.log(jnp.maximum(u_m, 1e-38))
            scatters = hit_dist <= dist_inside
            t_m = t1c + hit_dist / r_len
            is_m = both & ordered & scatters & (t_m < t)
            t = jnp.where(is_m, t_m, t)
            cmat = jnp.where(is_m, med_par[m_i, 1], cmat)
            is_med = is_med | is_m
            med_idx = jnp.where(is_m, jnp.float32(m_i), med_idx)

        finite = t < INF
        t_safe = jnp.where(finite, t, 0.0)
        point = _add(o, _scale(d, t_safe))

        # hit attributes (hit_attributes + medium overrides)
        n_vec = _where(is_sph > 0.5, _sub(point, (capx, capy, capz)),
                       (capx, capy, capz))
        ones = jnp.ones_like(t)
        # miss lanes carry a zero capture; keep them finite (masked later)
        safe = _where(_dot(n_vec, n_vec) > 0.0, n_vec, (ones, ones, ones))
        n_unit = _unit(safe)
        front = _dot(d, n_unit) < 0.0
        normal = _where(front, n_unit, _scale(n_unit, -1.0))
        if media_np:
            pr1, pr2, _, _ = _uniform4(pixc, sample, bounce, hrng.P_PHASE,
                                       seed)
            phase_n = _unit_vector_sample(pr1, pr2)
            normal = _where(is_med, phase_n, normal)
            front = front & ~is_med

        # scatter (integrator.scatter, one-for-one)
        if has_blend:
            ub = _uniform4(pixc, sample, bounce, hrng.P_BLEND_SCATTER, seed)
            eff = resolve_blend(cmat, ub)
        else:
            eff = cmat
        row = mat_lookup(eff)
        mk = row["kind"]
        albedo = tex_lookup(row["albedo_tex"])
        if has_image:
            tu, tv = ctu, ctv
            if n_sph > 0:
                # spherical uv from the UNFLIPPED outward normal
                # (sphere.rs:134-140 / hit_attributes_soa), using the
                # in-kernel Cephes acos/atan2 (Mosaic has no lowering)
                theta = _acos(jnp.clip(-n_unit[1], -1.0, 1.0))
                phi = -_atan2(n_unit[2], n_unit[0]) + _PI
                sph = is_sph > 0.5
                tu = jnp.where(sph, phi / (2.0 * _PI), tu)
                tv = jnp.where(sph, theta / _PI, tv)
            # texture metadata (offset w h is_img) via masked rows
            zm = jnp.zeros_like(tu)
            toff, tw, th, timg = zm, zm + 1.0, zm + 1.0, zm
            for ti in range(n_tex):
                sel = row["albedo_tex"] == jnp.float32(ti)
                toff = jnp.where(sel, texmeta_ref[ti, 0], toff)
                tw = jnp.where(sel, texmeta_ref[ti, 1], tw)
                th = jnp.where(sel, texmeta_ref[ti, 2], th)
                timg = jnp.where(sel, texmeta_ref[ti, 3], timg)
            # nearest-neighbor, abs-wrap, flipped v (texture.rs:167-180)
            uu = jnp.abs(tu) % 1.0
            vv = 1.0 - jnp.abs(tv) % 1.0
            xi = jnp.floor(uu * (tw - 1.0))
            yi = jnp.floor(vv * (th - 1.0))
            pix_idx = (toff + yi * tw + xi).astype(jnp.int32)
            need = jnp.max((timg * active.astype(jnp.float32))
                           .astype(jnp.int32))

            @pl.when(need > 0)
            def _():
                _arena_fetch(pix_idx * 3)

            img_rgb = (rgb_vm[0, :, :], rgb_vm[1, :, :], rgb_vm[2, :, :])
            albedo = _where(timg > 0.5, img_rgb, albedo)

        is_light = mk == DIFFUSE_LIGHT
        is_lamb = mk == LAMBERTIAN
        is_iso = mk == ISOTROPIC
        is_metal = mk == METAL
        is_pdf = is_lamb | is_iso

        emit = _where(front, albedo, (zero, zero, zero))
        atten = row["atten"]

        r1, r2, _, _ = _uniform4(pixc, sample, bounce, hrng.P_COSINE, seed)
        ct, cb, cn = _onb_from_w(normal)
        bsdf_dir = _where(is_iso, _unit_vector_sample(r1, r2),
                          _onb_local(ct, cb, cn, _cosine_sample(r1, r2)))

        u_pick, _, _, _ = _uniform4(pixc, sample, bounce, hrng.P_LIGHT_PICK,
                                    seed)
        pick = jnp.minimum(jnp.floor(u_pick * jnp.float32(n_light)),
                           jnp.float32(n_light - 1))
        l1, l2, _, _ = _uniform4(pixc, sample, bounce, hrng.P_LIGHT_SAMPLE,
                                 seed)
        light_dir = sample_light_dir(point, pick, l1, l2)

        u_coin, _, _, _ = _uniform4(pixc, sample, bounce, hrng.P_MIX_COIN,
                                    seed)
        pdf_dir = _where(u_coin < 0.5, light_dir, bsdf_dir)

        light_val = light_pdf_mean(point, pdf_dir)
        updir = _unit(pdf_dir)
        cos_value = jnp.maximum(_dot(updir, _unit(normal)), 0.0) / jnp.pi
        sphere_value = jnp.float32(1.0 / (4.0 * jnp.pi))
        bsdf_val = jnp.where(is_iso, sphere_value, cos_value)
        mix_val = 0.5 * light_val + 0.5 * bsdf_val
        cos_sc = _dot(normal, updir)
        lamb_sc = jnp.where(cos_sc < 0.0, 0.0, cos_sc / jnp.pi)
        scat_pdf = jnp.where(is_iso, sphere_value, lamb_sc)
        prob = jnp.where(is_pdf, scat_pdf / mix_val, 1.0)

        f1, f2, f3, _ = _uniform4(pixc, sample, bounce, hrng.P_FUZZ, seed)
        ud = _unit(d)
        metal_dir = _add(_reflect(ud, normal),
                         _scale(_in_unit_sphere(f1, f2, f3), row["fuzz"]))

        ior = row["ior"]
        rr_ratio = jnp.where(front, 1.0 / ior, ior)
        cos_t = jnp.minimum(-_dot(ud, normal), 1.0)
        sin_t = jnp.sqrt(jnp.maximum(0.0, 1.0 - cos_t * cos_t))
        cannot = rr_ratio * sin_t > 1.0
        r0 = (1.0 - rr_ratio) / (1.0 + rr_ratio)
        r0 = r0 * r0
        om = 1.0 - cos_t
        reflectance = r0 + (1.0 - r0) * om * om * om * om * om
        u_d, _, _, _ = _uniform4(pixc, sample, bounce, hrng.P_DIELECTRIC,
                                 seed)
        diel_dir = _where(cannot | (reflectance > u_d),
                          _reflect(ud, normal),
                          _refract(ud, normal, rr_ratio))

        new_dir = _where(is_pdf, pdf_dir,
                         _where(is_metal, metal_dir, diel_dir))

        # terminal classification (trace_queued one_step)
        miss = active & ~finite
        capped = active & finite & (bounce >= max_depth)
        emit_t = active & finite & ~capped & is_light
        scat = active & finite & ~capped & ~is_light
        terminal = miss | capped | emit_t

        total_len = st["acc_len"] + t_safe
        bg = (cam_ref[19], cam_ref[20], cam_ref[21])
        term_color = _where(miss, bg,
                            _where(emit_t, emit, (zero, zero, zero)))
        term_af = jnp.where(emit_t, atten, 0.0)
        term_acc = jnp.where(emit_t, total_len, 0.0)

        # fold_resolve
        A, B = st["A"], st["B"]
        dead = tuple(m > 0.5 for m in st["dead"])
        outer = st["outer"] > 0.5
        L = []
        for ch in range(3):
            dead_t = dead[ch] | (_isnan(term_color[ch]) & outer)
            L.append(jnp.where(dead_t, 0.0,
                               jnp.minimum(A[ch] * term_color[ch], B[ch])))
        att = jnp.where(term_af > 0.0, 1.0 / (1.0 + term_af * term_acc), 1.0)
        acc = tuple(
            st["acc"][ch] + jnp.where(terminal, L[ch] * att, 0.0)
            for ch in range(3))

        # fold_scatter + reset on terminal
        newA, newB, newdead = [], [], []
        pdf_lvl = scat & is_pdf
        basic_lvl = scat & ~is_pdf
        for ch in range(3):
            a_ch = albedo[ch] * prob
            nan_a = _isnan(a_ch)
            b_ch = jnp.where(pdf_lvl, jnp.minimum(B[ch], 3.0 * A[ch]), B[ch])
            d_ch = dead[ch] | (pdf_lvl & nan_a) | (basic_lvl & nan_a & outer)
            a_new = jnp.where(scat, A[ch] * a_ch, A[ch])
            newA.append(jnp.where(terminal, 1.0, a_new))
            newB.append(jnp.where(terminal, INF, b_ch))
            newdead.append(jnp.where(terminal | ~d_ch, 0.0, 1.0))
        new_outer = jnp.where(terminal | ~(outer | pdf_lvl), 0.0, 1.0)

        # regenerate / advance
        new_sample = jnp.where(terminal, sample + 1, sample)
        o_new, d_new = cam_rays(new_sample)
        o2 = _where(terminal, o_new, _where(scat, point, o))
        d2 = _where(terminal, d_new, _where(scat, new_dir, d))
        bounce2 = jnp.where(terminal, 0, jnp.where(scat, bounce + 1, bounce))
        acc_len2 = jnp.where(terminal, 0.0,
                             jnp.where(scat, total_len, st["acc_len"]))

        still = (new_sample < sample_end) & pix_ok
        return dict(
            n_active=jnp.sum(still.astype(jnp.int32)),
            sample=new_sample, bounce=bounce2, o=o2, d=d2, acc_len=acc_len2,
            A=tuple(newA), B=tuple(newB), dead=tuple(newdead),
            outer=new_outer, acc=acc,
            segments=st["segments"] + jnp.sum(active.astype(jnp.float32)))

    state = jax.lax.while_loop(cond, body, state)
    out_r[...] = state["acc"][0]
    out_g[...] = state["acc"][1]
    out_b[...] = state["acc"][2]
    # per-tile segment count at [0,0] of a VMEM block (SMEM outputs do not
    # tile on Mosaic); the host sums the whole plane
    first = (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 0) == 0) \
        & (jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _LANES), 1) == 0)
    seg_ref[...] = jnp.where(first, state["segments"], 0.0)


# --- host wrapper -----------------------------------------------------------

# largest u8-packed texture arena the in-kernel SMEM copy can hold; SMEM
# totals 1 MB and scratch allocations beyond ~512 KB fail to compile
ARENA_SMEM_BYTES = 448 * 1024


def megakernel_supported(cs, *, need_aux, shader_kind):
    """Static gate: the megakernel covers path-tracing renders of scenes
    whose tables fit SMEM, with solid-color or small u8 image textures and
    no normal maps. Everything else uses the wavefront integrator."""
    if shader_kind != 0 or need_aux:
        return False
    if cs.bvh is not None:         # large scenes: packet-BVH path
        return False
    if "normal_maps" in cs.features:
        return False
    if "image_tex" in cs.features:
        # image textures need (a) every image texel u8-exact (checked at
        # compile time — the "image_tex_u8" feature flag) so the in-kernel
        # u8 arena round-trips losslessly, and (b) the arena to fit the
        # SMEM budget (static: arena row count). Image-textured SPHERES
        # use the in-kernel Cephes acos/atan2 spherical uv (~1e-6 rad —
        # a sub-half-texel uv error for any texture up to 16k wide).
        if "image_tex_u8" not in cs.features:
            return False
        if cs.textures.pixels.shape[0] * 3 > ARENA_SMEM_BYTES:
            return False
    if cs.solids.pl_n.shape[0] > 1024 or cs.solids.sph_center.shape[0] > 128:
        return False
    if cs.lights.kind.shape[0] > 32 or cs.materials.kind.shape[0] > 64:
        return False
    if cs.textures.attr.shape[0] > 64:
        return False
    for med in cs.media:
        if med.boundary.pl_n.shape[0] > 64:
            return False
    return True


def _pack_planar16(s):
    """(P, 22) planar rows: n(3) d g1(3) g1o g2(3) g2o is_tri valid mat pad
    uv0(2) duv1(2) duv2(2) — the uv-map tail feeds image-texture lookups
    (pl_attr cols 17:23, scene/compile.py)."""
    return jnp.concatenate([
        s.pl_n, s.pl_d[:, None], s.pl_g1, s.pl_g1o[:, None],
        s.pl_g2, s.pl_g2o[:, None],
        s.pl_is_tri.astype(jnp.float32)[:, None],
        s.pl_valid.astype(jnp.float32)[:, None],
        _planar_mats(s)[:, None],
        jnp.zeros((s.pl_n.shape[0], 1), jnp.float32),
        s.pl_attr[:, 17:23].astype(jnp.float32)], axis=1)


def _planar_mats(s):
    # pl_attr column 23 is the planar material id (scene/compile.py)
    return s.pl_attr[:, 23]


def _pack_sphere8(s):
    return jnp.concatenate([
        s.sph_center, s.sph_radius[:, None],
        s.sph_valid.astype(jnp.float32)[:, None],
        s.sph_mat.astype(jnp.float32)[:, None],
        jnp.zeros((s.sph_center.shape[0], 2), jnp.float32)], axis=1)


@functools.partial(jax.jit, static_argnames=("width", "height", "max_depth",
                                             "interpret"))
def render_batch_megakernel(cs, sample_start, n_samples, seed, *, width,
                            height, max_depth, interpret=False):
    """Render n_samples progressive passes of the full image in ONE Pallas
    launch. Returns (accum (width*height, 3) pixel-id order, segments)."""
    n_pix = width * height
    n_pad = (n_pix + TILE - 1) // TILE * TILE
    n_tiles = n_pad // TILE

    scal = jnp.stack([jnp.int32(width), jnp.int32(height),
                      jnp.asarray(sample_start, jnp.int32),
                      jnp.asarray(n_samples, jnp.int32),
                      jnp.int32(max_depth), jnp.asarray(seed, jnp.int32),
                      jnp.int32(n_pix), jnp.int32(0)])
    cam = cs.camera
    cam_row = jnp.concatenate([
        cam.origin, cam.lower_left, cam.horizontal, cam.vertical,
        cam.u, cam.v, jnp.reshape(cam.lens_radius, (1,)),
        cs.bg_color, jnp.zeros((2,), jnp.float32)])

    sph = _pack_sphere8(cs.solids)
    pln = _pack_planar16(cs.solids)
    mats = cs.materials.attr  # kind albedo_tex normal_tex fuzz ior atten bf m1 m2
    # per-texture FIRST-pixel rows: the solid-color fast path (image
    # texels come from the u8 arena below)
    texs = jnp.concatenate([
        cs.textures.pixels[cs.textures.offset],
        jnp.zeros((cs.textures.offset.shape[0], 1), jnp.float32)], axis=1)
    has_image = "image_tex" in cs.features  # static feature flag
    arena_words = 0
    image_in = []
    if has_image:
        px_u8 = jnp.clip(jnp.round(cs.textures.pixels * 255.0),
                         0, 255).astype(jnp.int32).reshape(-1)
        n_b = px_u8.shape[0]
        padb = (-n_b) % 4
        px_u8 = jnp.concatenate([px_u8, jnp.zeros((padb,), jnp.int32)])
        w4 = px_u8.reshape(-1, 4)
        arena = (w4[:, 0] | (w4[:, 1] << 8) | (w4[:, 2] << 16)
                 | (w4[:, 3] << 24))
        arena_words = arena.shape[0]
        texmeta = jnp.stack([
            cs.textures.offset.astype(jnp.float32),
            cs.textures.w.astype(jnp.float32),
            cs.textures.h.astype(jnp.float32),
            (cs.textures.w * cs.textures.h > 1).astype(jnp.float32)],
            axis=1)
        image_in = [texmeta, arena]
    lights = jnp.concatenate([
        cs.lights.kind.astype(jnp.float32)[:, None],
        cs.lights.p0, cs.lights.p1, cs.lights.p2,
        cs.lights.radius[:, None], cs.lights.normal,
        cs.lights.d[:, None], cs.lights.w, cs.lights.area[:, None],
        jnp.zeros((cs.lights.kind.shape[0], 1), jnp.float32)], axis=1)

    med_tabs = []
    media_np = []
    med_par_rows = []
    for med in cs.media:
        ms = _pack_sphere8(med.boundary)
        mp = _pack_planar16(med.boundary)
        med_tabs += [ms, mp]
        media_np.append((ms.shape[0], mp.shape[0]))
        med_par_rows.append(jnp.stack([
            jnp.asarray(med.neg_inv_density, jnp.float32),
            med.mat.astype(jnp.float32),
            jnp.float32(0.0), jnp.float32(0.0)]))
    extra = []
    if media_np:
        extra = [jnp.stack(med_par_rows)]

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    seg_spec = pl.BlockSpec((_ROWS, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    kern = functools.partial(
        _render_kernel,
        n_sph=sph.shape[0], n_pl=pln.shape[0], n_mat=mats.shape[0],
        n_tex=texs.shape[0], n_light=lights.shape[0],
        media_np=tuple(media_np), has_blend="blend" in cs.features,
        arena_words=arena_words)

    scratches = []
    image_specs = []
    if has_image:
        image_specs = [smem, pl.BlockSpec(memory_space=pl.ANY)]
        scratches = [
            pltpu.VMEM((_ROWS, _LANES), jnp.int32),        # idx_vm
            pltpu.VMEM((3, _ROWS, _LANES), jnp.float32),   # rgb_vm
            pltpu.SMEM((_ROWS, _LANES), jnp.int32),        # idx_sm
            pltpu.SMEM((3, _ROWS, _LANES), jnp.float32),   # rgb_sm
            pltpu.SMEM((arena_words,), jnp.int32),         # arena_sm
            pltpu.SemaphoreType.DMA(()),                   # asem
            pltpu.SemaphoreType.DMA(()),                   # xsem
        ]

    r, g, b, segs = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=([smem] * (7 + len(med_tabs) + len(extra)) + image_specs),
        scratch_shapes=scratches,
        out_specs=(out_spec, out_spec, out_spec, seg_spec),
        out_shape=(jax.ShapeDtypeStruct((n_tiles * _ROWS, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles * _ROWS, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles * _ROWS, _LANES),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((n_tiles * _ROWS, _LANES),
                                        jnp.float32)),
        interpret=interpret,
    )(scal, cam_row, sph, pln, mats, texs, lights, *med_tabs, *extra,
      *image_in)

    accum = jnp.stack([r.reshape(-1)[:n_pix], g.reshape(-1)[:n_pix],
                       b.reshape(-1)[:n_pix]], axis=-1)
    return accum, jnp.sum(segs)
