"""Benchmark: path-tracing throughput in Mrays/s on the reference's
kitchen-sink test scene (the reference's own profiling workload,
src/bin/profiling.rs:15-21, measures the same scene on CPU).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the Rust reference's single-core-equivalent
throughput estimate recorded in BASELINE.md (no published numbers exist;
we use the driver north-star of 100 Mrays/s/chip as baseline=1.0).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "tests"))

import jax
import jax.numpy as jnp

# persistent compile cache — axon remote compiles take minutes
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.renderer import integrator
    from solstrale_tpu.scene.compile import compile_scene

    width, height, spp, max_depth = 400, 266, 8, 50
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=spp,
                       seed=1)
    scene = create_test_scene(cfg)
    cs = compile_scene(scene)

    def run(sample_start):
        color, _, _, segs = integrator.render_sample_batch(
            cs, sample_start, jnp.int32(1), width=width, height=height,
            max_depth=max_depth, shader_kind=integrator.SHADER_PATH,
            need_aux=False, n_samples=spp)
        return color, segs

    import numpy as np

    # warmup/compile (np.asarray forces full completion — block_until_ready
    # returns early under the axon remote backend)
    np.asarray(run(jnp.int32(100))[0])

    t0 = time.perf_counter()
    color, segs = run(jnp.int32(1))
    color = np.asarray(color)
    dt = time.perf_counter() - t0

    # Rays/s counts actual path segments traced (primary + bounce rays),
    # the standard Mrays metric; the integrator counts them exactly.
    total_segments = float(segs)
    mrays = total_segments / dt / 1e6

    north_star = 100.0  # Mrays/s/chip (BASELINE.json)
    print(json.dumps({
        "metric": "mrays_per_s_test_scene",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / north_star, 4),
    }))


if __name__ == "__main__":
    main()
