"""Ablation profiler: times integrator components ON DEVICE (fori_loop of N
iterations inside one jit, scalar output — no host-transfer or
constant-folding contamination). Run on TPU (default env) or CPU.

Usage: python tools/profile_tpu.py [width height iters]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def device_time(name, make_body, iters):
    """Time `iters` on-device iterations of make_body(i, carry)->carry where
    carry is a f32 scalar; returns seconds per iteration."""

    @jax.jit
    def run(seed):
        return jax.lax.fori_loop(0, iters, make_body, seed)

    float(run(jnp.float32(0.0)))  # compile+warmup
    t0 = time.perf_counter()
    float(run(jnp.float32(1.0)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:44s} {dt * 1e3:9.3f} ms/iter")
    return dt


def main():
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.geo import INF, RAY_T_MIN
    from solstrale_tpu.ops import rng
    from solstrale_tpu.ops.intersect import (closest_solid_hit,
                                             hit_attributes,
                                             light_pdf_values, medium_hit)
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 266
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 20
    from solstrale_tpu.geo import soa

    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg))
    n = width * height
    pix = jnp.arange(n, dtype=jnp.int32)
    _, o0s, d0s = I.camera_rays(cs, pix, width, height, jnp.int32(1),
                                jnp.int32(1))
    o0, d0 = soa.to_aos(o0s), soa.to_aos(d0s)
    print(f"rays={n}  spheres={int(cs.solids.sph_valid.sum())}  "
          f"planar={int(cs.solids.pl_valid.sum())}  iters={iters}")

    def vary(seed_carry):
        # make inputs depend on the carry so nothing constant-folds
        return o0 + seed_carry * 1e-12, d0

    def body_hit(i, c):
        o, d = vary(c)
        t, kind, idx = closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)
        return c + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-12

    t_hit = device_time("closest_solid_hit (solids sweep)", body_hit, iters)

    t0, kind0, idx0 = jax.jit(
        lambda: closest_solid_hit(cs.solids, o0, d0, RAY_T_MIN, INF))()
    ts0 = jnp.where(jnp.isfinite(t0), t0, 0.0)

    def body_med(i, c):
        o, d = vary(c)
        u = rng.uniform(pix, 1, i, 16, 1)
        acc = c
        for med in cs.media:
            tm = medium_hit(med, o, d, ts0, u)
            acc = acc + jnp.sum(jnp.where(jnp.isfinite(tm), tm, 0.0)) * 1e-12
        return acc

    device_time("medium_hit (all media)", body_med, iters)

    def body_attr(i, c):
        o, d = vary(c)
        attrs = hit_attributes(cs.solids, o, d, ts0 + c * 1e-12, kind0, idx0)
        return c + jnp.sum(attrs["normal"]) * 1e-12

    device_time("hit_attributes (one-hot)", body_attr, iters)

    attrs0 = jax.jit(lambda: hit_attributes(cs.solids, o0, d0, ts0, kind0,
                                            idx0))()

    attrs0s = jax.jit(lambda: I.full_hit_attributes(
        cs, o0s, d0s, ts0, kind0, idx0, pix, 1, 0, 1))()

    def body_scatter(i, c):
        a = dict(attrs0s)
        a["point"] = tuple(p + c * 1e-12 for p in attrs0s["point"])
        sc = I.scatter(cs, o0s, d0s, a, pix, 1, i, 1)
        return c + jnp.sum(sc["new_dir"][0]) * 1e-12

    device_time("scatter (materials+NEE+texture)", body_scatter, iters)

    def body_lpdf(i, c):
        p = attrs0["point"] + c * 1e-12
        return c + jnp.sum(light_pdf_values(cs.lights, p, d0)) * 1e-12

    device_time("light_pdf_values", body_lpdf, iters)

    def body_tex(i, c):
        uv = tuple(u + c * 1e-12 for u in attrs0s["uv"])
        return c + jnp.sum(I.sample_texture(
            cs.textures, jnp.zeros(n, jnp.int32), uv)[0]) * 1e-12

    device_time("sample_texture (arena gather)", body_tex, iters)

    def body_rng(i, c):
        u = rng.uniform4(pix, 1, i, 5, 1)
        return c + jnp.sum(u[0]) * 1e-12

    device_time("rng.uniform4", body_rng, iters)

    def body_step(i, c):
        o = tuple(p + c * 1e-12 for p in o0s)
        zero = o[0] * 0.0
        carry = (o, d0s, zero == zero, zero, (zero, zero, zero), zero, zero,
                 I.fold_init(zero))
        carry = I.bounce_step(cs, carry, i, pix, jnp.int32(1),
                              jnp.int32(1))
        return c + jnp.sum(carry[0][0]) * 1e-12

    t_step = device_time("bounce_step (everything)", body_step, iters)

    # full regen batch for reference
    @jax.jit
    def full(sample):
        color, _, _, segs = I.render_sample_batch(
            cs, sample, jnp.int32(1), width=width, height=height,
            max_depth=50, shader_kind=0, need_aux=False, n_samples=4)
        return jnp.sum(color), segs

    s0 = full(jnp.int32(50))
    float(s0[0])
    t0_ = time.perf_counter()
    out = full(jnp.int32(1))
    segs = float(out[1])
    total = float(out[0])
    dt = time.perf_counter() - t0_
    print(f"{'render_sample_batch(4spp, regen)':44s} {dt * 1e3:9.3f} ms  "
          f"segments={segs:.0f}  mrays={segs / dt / 1e6:.2f}")
    print(f"implied regen iterations: {dt / t_step:.1f}")


if __name__ == "__main__":
    main()
