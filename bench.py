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
        color, _, _ = integrator.render_sample_batch(
            cs, sample_start, jnp.int32(1), width=width, height=height,
            max_depth=max_depth, shader_kind=integrator.SHADER_PATH,
            need_aux=False, n_samples=spp)
        return color

    import numpy as np

    # warmup/compile (np.asarray forces full completion — block_until_ready
    # returns early under the axon remote backend)
    np.asarray(run(jnp.int32(100)))

    t0 = time.perf_counter()
    acc = np.asarray(run(jnp.int32(1)))
    dt = time.perf_counter() - t0

    # Rays/s counts actual path segments traced (primary + bounce), the
    # standard Mrays metric. Segment count is measured exactly once via an
    # instrumented single-sample pass.
    segs = measure_segments(cs, width, height, max_depth)
    total_segments = segs * spp
    mrays = total_segments / dt / 1e6

    north_star = 100.0  # Mrays/s/chip (BASELINE.json)
    print(json.dumps({
        "metric": "mrays_per_s_test_scene",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / north_star, 4),
    }))


def measure_segments(cs, width, height, max_depth):
    """Count path segments (camera + bounce rays) in one sample pass."""
    import jax

    from solstrale_tpu.renderer import integrator as I

    pix = jnp.arange(width * height, dtype=jnp.int32)

    @jax.jit
    def count(sample):
        _, o, d = I.camera_rays(cs, pix, width, height, sample, jnp.int32(1))
        n = o.shape[0]
        zero = o[:, 0] * 0.0
        carry = (o, d, zero == zero, zero, o * 0.0, zero, zero)
        total = jnp.zeros((), jnp.float32)

        def body(c, bounce):
            carry, total = c
            alive = carry[2]
            segs = jnp.sum(alive.astype(jnp.float32))
            carry, _ = I.bounce_step(cs, carry, bounce, pix, sample,
                                     jnp.int32(1))
            return (carry, total + segs), None

        (carry, total), _ = jax.lax.scan(body, (carry, total),
                                         jnp.arange(max_depth))
        return total

    return float(count(jnp.int32(1)))


if __name__ == "__main__":
    main()
