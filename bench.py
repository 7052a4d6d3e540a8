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


def _measure(cs, width, height, spp, max_depth):
    import numpy as np
    from solstrale_tpu.renderer import integrator

    def run(sample_start):
        color, _, _, segs = integrator.render_sample_batch(
            cs, sample_start, jnp.int32(1), width=width, height=height,
            max_depth=max_depth, shader_kind=integrator.SHADER_PATH,
            need_aux=False, n_samples=spp)
        return color, segs

    # warmup/compile (np.asarray forces full completion — block_until_ready
    # returns early under the axon remote backend)
    np.asarray(run(jnp.int32(100))[0])

    t0 = time.perf_counter()
    color, segs = run(jnp.int32(1))
    color = np.asarray(color)
    dt = time.perf_counter() - t0

    # Rays/s counts actual path segments traced (primary + bounce rays),
    # the standard Mrays metric; the integrator counts them exactly.
    return float(segs) / dt / 1e6


def main():
    from scenes import create_sponza_class_scene, create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.scene.compile import compile_scene

    # kitchen-sink: the reference's own profiling workload
    # (src/bin/profiling.rs:15-21), 400x266 @ 8 spp, depth 50
    cfg = RenderConfig(width=400, height=266, samples_per_pixel=8, seed=1)
    cs = compile_scene(create_test_scene(cfg))
    ks_mrays = _measure(cs, 400, 266, 8, 50)

    # sponza-class: the BASELINE.json north-star workload — 262k-triangle
    # interior mesh at 1920x1080 (packet-BVH fast path)
    cfg2 = RenderConfig(width=1920, height=1080, samples_per_pixel=1, seed=1)
    cs2 = compile_scene(create_sponza_class_scene(cfg2))
    sponza_mrays = _measure(cs2, 1920, 1080, 1, 50)

    north_star = 100.0  # Mrays/s/chip sponza 1080p (BASELINE.json)
    print(json.dumps({
        "metric": "sponza_1080p_mrays_per_s",
        "value": round(sponza_mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(sponza_mrays / north_star, 4),
        "kitchen_sink_mrays_per_s": round(ks_mrays, 3),
    }))


if __name__ == "__main__":
    main()
