"""Sponza hot-path ablation profiler: times the packet-BVH kernel, full
scene_hit, hit_attributes and scatter per 131072-lane queue iteration ON
DEVICE (fori_loop inside one jit, scalar output — dispatch/transfer free).

Rays are the real thing: iteration-0 primaries from the queue's tile
swizzle, and a "bounce 1" set produced by actually scattering them once
(the divergent workload the later queue iterations see).

Usage: python tools/profile_sponza.py [iters] [lanes]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def device_time(name, make_body, iters):
    @jax.jit
    def run(seed):
        return jax.lax.fori_loop(0, iters, make_body, seed)

    float(run(jnp.float32(0.0)))  # compile+warmup
    t0 = time.perf_counter()
    float(run(jnp.float32(1.0)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt * 1e3:9.3f} ms/iter", flush=True)
    return dt


def main():
    from scenes import create_sponza_class_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.geo import RAY_T_MIN, soa
    from solstrale_tpu.ops.intersect import hit_attributes_soa
    from solstrale_tpu.ops.pallas_bvh import bvh_planar_hit_pallas
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    lanes = int(sys.argv[2]) if len(sys.argv) > 2 else 131072
    width, height = 1920, 1080

    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1,
                       seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))
    print(f"lanes={lanes} planar={int(cs.solids.pl_valid.sum())} "
          f"troots={cs.kbvh.n_troots} tr={cs.kbvh.tr}", flush=True)

    # iteration-0 queue rays: tile-swizzled pixel-major primaries
    tw, th = 32, 8
    qpos = jnp.arange(lanes, dtype=jnp.int32)
    tile, within = qpos // (tw * th), qpos % (tw * th)
    tx, ty = tile % (width // tw), tile // (width // tw)
    pix = (ty * th + within // tw) * width + tx * tw + within % tw

    @jax.jit
    def gen():
        _, o, d = I.camera_rays(cs, pix, width, height, jnp.int32(0),
                                jnp.int32(1))
        t, kind, idx = I.scene_hit(cs, o, d, pix, 0, 0, 1)
        ts = jnp.where(jnp.isfinite(t), t, 0.0)
        attrs = I.full_hit_attributes(cs, o, d, ts, kind, idx, pix, 0, 0, 1)
        sc = I.scatter(cs, o, d, attrs, pix, 0, 0, 1)
        o1 = soa.where3(jnp.isfinite(t), attrs["point"], o)
        d1 = soa.where3(jnp.isfinite(t), sc["new_dir"], d)
        return o, d, o1, d1, ts, kind, idx

    o0, d0, o1, d1, ts0, kind0, idx0 = gen()
    o0 = tuple(jnp.asarray(c) for c in o0)

    def mk_kernel(o, d):
        def body(i, c):
            oo = tuple(p + c * 1e-12 for p in o)
            t, s = bvh_planar_hit_pallas(cs.kbvh, oo, d, RAY_T_MIN)
            return c + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-12
        return body

    device_time("bvh kernel (primary rays)", mk_kernel(o0, d0), iters)
    device_time("bvh kernel (bounce-1 rays)", mk_kernel(o1, d1), iters)

    def body_scene_hit(i, c):
        oo = tuple(p + c * 1e-12 for p in o0)
        t, kind, idx = I.scene_hit(cs, oo, d0, pix, 0, i, 1)
        return c + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-12

    device_time("scene_hit (kernel + spheres + combine)", body_scene_hit,
                iters)

    def body_attr(i, c):
        a = hit_attributes_soa(cs.solids, o0, d0, ts0 + c * 1e-12, kind0,
                               idx0)
        return c + jnp.sum(a["normal"][0]) * 1e-12

    device_time("hit_attributes_soa", body_attr, iters)

    attrs0 = jax.jit(lambda: I.full_hit_attributes(
        cs, o0, d0, ts0, kind0, idx0, pix, 0, 0, 1))()

    def body_scatter(i, c):
        a = dict(attrs0)
        a["point"] = tuple(p + c * 1e-12 for p in attrs0["point"])
        sc = I.scatter(cs, o0, d0, a, pix, 0, i, 1)
        return c + jnp.sum(sc["new_dir"][0]) * 1e-12

    device_time("scatter (materials+NEE)", body_scatter, iters)

    # direct trace_queued with iteration count
    @jax.jit
    def tq(sample):
        accum, segs, iters = I.trace_queued(
            cs, None, sample, 1, jnp.int32(1), width=width, height=height,
            max_depth=50, lanes=lanes, stats=True)
        return jnp.sum(accum), segs, iters

    r = tq(jnp.int32(3)); float(r[0])
    t0 = time.perf_counter()
    r = tq(jnp.int32(1))
    segs, iters = float(r[1]), int(r[2])
    dt = time.perf_counter() - t0
    print(f"{'trace_queued direct':46s} {dt * 1e3:9.3f} ms   "
          f"iters={iters}  segs={segs:.0f}  "
          f"ms/iter={dt * 1e3 / max(iters, 1):.2f}  "
          f"occupancy={segs / (iters * float(lanes)) * 100:.1f}%", flush=True)

    # full queue-step percentage check: one whole frame
    @jax.jit
    def frame(sample):
        color, _, _, segs = I.render_sample_batch(
            cs, sample, jnp.int32(1), width=width, height=height,
            max_depth=50, shader_kind=0, need_aux=False, n_samples=1)
        return jnp.sum(color), segs

    r = frame(jnp.int32(7))
    float(r[0])
    t0 = time.perf_counter()
    r = frame(jnp.int32(1))
    segs = float(r[1])
    dt = time.perf_counter() - t0
    print(f"{'full 1spp frame':46s} {dt * 1e3:9.3f} ms   "
          f"segments={segs:.0f}  mrays={segs / dt / 1e6:.2f}", flush=True)


if __name__ == "__main__":
    main()
