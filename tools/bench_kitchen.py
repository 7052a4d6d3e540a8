"""Kitchen-sink (reference profiling workload) quick bench: 400x266 @ 8spp
depth 50 through render_sample_batch, printing ms + Mrays/s.
Usage: python tools/bench_kitchen.py [lanes ...]"""
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
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=400, height=266, samples_per_pixel=8, seed=1)
    cs = compile_scene(create_test_scene(cfg))

    lane_list = [int(a) for a in sys.argv[1:]] or [None]
    for lanes in lane_list:
        if lanes:
            os.environ["SOLSTRALE_LANES"] = str(lanes)
        else:
            os.environ.pop("SOLSTRALE_LANES", None)

        @jax.jit
        def run(sample_start):
            color, _, _, segs = I.render_sample_batch(
                cs, sample_start, jnp.int32(1), width=400, height=266,
                max_depth=50, shader_kind=I.SHADER_PATH,
                need_aux=False, n_samples=8)
            return jnp.sum(color), segs

        float(run(jnp.int32(100))[0])
        t0 = time.perf_counter()
        chk, segs = run(jnp.int32(1))
        chk = float(chk)
        dt = time.perf_counter() - t0
        print(f"lanes={lanes or 'auto':>7} {dt * 1e3:8.1f} ms  "
              f"mrays={float(segs) / dt / 1e6:5.2f}  checksum={chk:.1f}",
              flush=True)
        jax.clear_caches()
    os.environ.pop("SOLSTRALE_LANES", None)


if __name__ == "__main__":
    main()
