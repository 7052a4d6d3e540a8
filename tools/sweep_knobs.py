"""Sweep env knobs (lanes, sort bits) on the sponza 1spp frame.
Usage: python tools/sweep_knobs.py"""
import os
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
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1,
                       seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))

    def frame(lanes, bits, mode="octant", unroll=1):
        os.environ["SOLSTRALE_SORT_BITS"] = str(bits)
        os.environ["SOLSTRALE_SORT_KEY"] = mode
        os.environ["SOLSTRALE_UNROLL"] = str(unroll)

        @jax.jit
        def tq(sample):
            accum, segs, iters = I.trace_queued(
                cs, None, sample, 1, jnp.int32(1), width=width,
                height=height, max_depth=50, lanes=lanes, stats=True)
            return jnp.sum(accum), segs, iters

        r = tq(jnp.int32(3)); float(r[0])
        t0 = time.perf_counter()
        r = tq(jnp.int32(1))
        chk, segs, iters = float(r[0]), float(r[1]), int(r[2])
        dt = time.perf_counter() - t0
        print(f"lanes={lanes:7d} bits={bits} key={mode:6s} u={unroll}  "
              f"{dt * 1e3:8.1f} ms  iters={iters}  "
              f"mrays={segs / dt / 1e6:5.2f}  checksum={chk:.1f}",
              flush=True)
        jax.clear_caches()

    cases = [(131072, 6, "octant", 1),
             (131072, 6, "octant", 1),
             (131072, 6, "octant", 1)]
    for lanes, bits, mode, unroll in cases:
        frame(lanes, bits, mode, unroll)
    for k in ("SOLSTRALE_SORT_BITS", "SOLSTRALE_SORT_KEY",
              "SOLSTRALE_UNROLL"):
        os.environ.pop(k, None)


if __name__ == "__main__":
    main()
