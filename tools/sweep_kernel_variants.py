"""Sweep BVH-kernel structure variants (FB, proj ordering) on sponza
bounce-1 rays. Each variant re-traces + recompiles (cached afterwards).
Usage: python tools/sweep_kernel_variants.py [iters]"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from scenes import create_sponza_class_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.geo import RAY_T_MIN, soa
    from solstrale_tpu.ops import pallas_bvh as PB
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    lanes = 131072
    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1,
                       seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))

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
        return o1, d1

    o1, d1 = gen()
    o1 = tuple(jnp.asarray(c) for c in o1)
    d1 = tuple(jnp.asarray(c) for c in d1)

    def timed(label):
        @jax.jit
        def run(seed):
            def body(i, c):
                oo = tuple(p + c * 1e-12 for p in o1)
                t, s = PB.bvh_planar_hit_pallas(cs.kbvh, oo, d1, RAY_T_MIN)
                return (c + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0))
                        * 1e-12)
            return jax.lax.fori_loop(0, iters, body, seed)

        float(run(jnp.float32(0.0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1.0)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{label:42s} {dt * 1e3:9.3f} ms/iter", flush=True)

    for fb, noproj, label in ((8, False, "FB=8 proj (base)"),
                              (16, False, "FB=16 proj"),
                              (8, True, "FB=8 no-proj"),
                              (16, True, "FB=16 no-proj"),
                              (32, False, "FB=32 proj")):
        PB.FB = fb
        PB.FQ = 2 * (1 << PB.TOP_LEVELS) + 2 * fb + 8
        PB.TL_CAP = (1 << (PB.TOP_LEVELS - 1)) + fb + 8
        PB._DEBUG_NO_PROJ = noproj
        jax.clear_caches()
        timed(label)
    PB.FB = 8
    PB.FQ = 2 * (1 << PB.TOP_LEVELS) + 2 * 8 + 8
    PB.TL_CAP = (1 << (PB.TOP_LEVELS - 1)) + 8 + 8
    PB._DEBUG_NO_PROJ = False


if __name__ == "__main__":
    main()
