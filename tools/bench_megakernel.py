"""TPU micro-bench: single-launch render megakernel vs the work-queue
wavefront on a solid-texture kitchen-sink analogue (all material kinds +
constant medium + thin lens), 400x266 @ 8 spp, depth 50.

Usage: python tools/bench_megakernel.py [width height spp]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "tests"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from test_megakernel import _mini_kitchen_sink
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.renderer import integrator, megakernel
    from solstrale_tpu.scene.compile import compile_scene

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 266
    spp = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    max_depth = 50

    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       seed=1)
    cs = compile_scene(_mini_kitchen_sink(cfg), use_bvh=False)
    assert megakernel.megakernel_supported(cs, need_aux=False, shader_kind=0)

    def run_mega(sample_start):
        return megakernel.render_batch_megakernel(
            cs, sample_start, jnp.int32(spp), jnp.int32(1), width=width,
            height=height, max_depth=max_depth)

    def run_queue(sample_start):
        return integrator.trace_queued(
            cs, None, sample_start, spp, jnp.int32(1), width=width,
            height=height, max_depth=max_depth)

    for name, fn in (("megakernel", run_mega), ("workqueue", run_queue)):
        # time via a device-side scalar checksum: np.asarray of the accum
        # would time the axon tunnel's multi-second array transfer, not the
        # render (PERF.md round-3 finding — a real host fetches locally)
        @jax.jit
        def chk(sample_start, fn=fn):
            accum, segs = fn(sample_start)
            return jnp.sum(accum), segs

        t0 = time.perf_counter()
        float(chk(jnp.int32(100))[0])
        print(f"# {name} compile+run: {time.perf_counter()-t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        total, segs = chk(jnp.int32(1))
        total = float(total)
        dt = time.perf_counter() - t0
        mrays = float(segs) / dt / 1e6
        print(f"{name:>12}: {dt*1e3:8.1f} ms  {float(segs)/1e6:7.2f} Mseg  "
              f"{mrays:8.2f} Mrays/s  checksum={total:.1f}", flush=True)


if __name__ == "__main__":
    main()
