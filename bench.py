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
    from solstrale_tpu.renderer import integrator

    @jax.jit
    def run(sample_start):
        color, _, _, segs = integrator.render_sample_batch(
            cs, sample_start, jnp.int32(1), width=width, height=height,
            max_depth=max_depth, shader_kind=integrator.SHADER_PATH,
            need_aux=False, n_samples=spp)
        # scalar checksum forces full completion (block_until_ready returns
        # early under the axon remote backend) without timing the multi-MB
        # image transfer through the dev tunnel — a real host fetches the
        # accumulator locally
        return jnp.sum(color), segs

    float(run(jnp.int32(100))[0])  # warmup/compile

    t0 = time.perf_counter()
    checksum, segs = run(jnp.int32(1))
    checksum = float(checksum)
    dt = time.perf_counter() - t0
    # a black frame means the workload degenerated (e.g. camera facing an
    # unlit backface) — refuse to report a meaningless throughput
    if not checksum > 0:
        raise RuntimeError(f"degenerate render: checksum={checksum}")

    # Rays/s counts actual path segments traced (primary + bounce rays),
    # the standard Mrays metric; the integrator counts them exactly.
    return float(segs) / dt / 1e6


NORTH_STAR = 100.0  # Mrays/s/chip sponza 1080p (BASELINE.json)


def _bench_kitchen_sink():
    """Reference's own profiling workload (src/bin/profiling.rs:15-21),
    400x266 @ 8 spp, depth 50."""
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=400, height=266, samples_per_pixel=8, seed=1)
    cs = compile_scene(create_test_scene(cfg))
    return _measure(cs, 400, 266, 8, 50)


def _bench_sponza():
    """BASELINE.json north-star workload — 262k-triangle interior mesh at
    1920x1080 (packet-BVH fast path)."""
    from scenes import create_sponza_class_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=1, seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))
    return _measure(cs, 1920, 1080, 1, 50)


def _bench_sponza_production():
    """Production-diversity flagship (VERDICT r4 item 3): the 259k-triangle
    terrain split into 16 materials of every kind, 4 image textures, 4
    emitters of all three shapes — the shape of the reference's showcase
    renders (README.md:23-27) at BVH scale, 1920x1080."""
    from scenes import create_sponza_production_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=1, seed=1)
    cs = compile_scene(create_sponza_production_scene(cfg))
    return _measure(cs, 1920, 1080, 1, 50)


def _bench_many_lights():
    """64-emitter BVH scene through the vectorized light-pdf fallback
    (VERDICT r4 item 6; reference cost center: pdf.rs:88-102), 960x540."""
    from scenes import create_many_light_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=960, height=540, samples_per_pixel=1, seed=1)
    cs = compile_scene(create_many_light_scene(cfg, n_lights=64))
    return _measure(cs, 960, 540, 1, 50)


def _bench_megakernel():
    """Single-launch render megakernel on the solid-texture kitchen-sink
    analogue (all material kinds + constant medium + thin lens, the
    reference profiling workload's shape, src/bin/profiling.rs:15-21),
    400x266 @ 8 spp depth 50. One pallas_call renders the whole
    progressive batch — the framework's lowest-overhead integrator."""
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tests"))
    from test_megakernel import _mini_kitchen_sink
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.renderer import megakernel
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=400, height=266, samples_per_pixel=8, seed=1)
    cs = compile_scene(_mini_kitchen_sink(cfg), use_bvh=False)
    assert megakernel.megakernel_supported(cs, need_aux=False, shader_kind=0)

    @jax.jit
    def run(sample_start):
        accum, segs = megakernel.render_batch_megakernel(
            cs, sample_start, jnp.int32(8), jnp.int32(1), width=400,
            height=266, max_depth=50)
        return jnp.sum(accum), segs

    float(run(jnp.int32(100))[0])
    t0 = time.perf_counter()
    checksum, segs = run(jnp.int32(1))
    checksum = float(checksum)
    dt = time.perf_counter() - t0
    if not checksum > 0:
        raise RuntimeError(f"degenerate render: checksum={checksum}")
    return float(segs) / dt / 1e6


def main():
    # Each workload is measured and reported independently so one crash can
    # never erase the others' numbers; the headline metric is printed LAST
    # (the driver records the final JSON line).
    ks_mrays = sponza_mrays = None
    ks_err = sponza_err = None
    extra = {}

    try:
        ks_mrays = _bench_kitchen_sink()
        print(json.dumps({
            "metric": "kitchen_sink_mrays_per_s",
            "value": round(ks_mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(ks_mrays / NORTH_STAR, 4),
        }), flush=True)
    except Exception as e:  # noqa: BLE001 — bench must always emit numbers
        ks_err = f"{type(e).__name__}: {e}"[:500]
        print(json.dumps({"metric": "kitchen_sink_mrays_per_s",
                          "error": ks_err}), flush=True)

    for name, fn in (("sponza_production_mrays_per_s",
                      _bench_sponza_production),
                     ("many_lights_mrays_per_s", _bench_many_lights),
                     ("megakernel_mrays_per_s", _bench_megakernel)):
        try:
            v = fn()
            extra[name] = round(v, 3)
            print(json.dumps({"metric": name, "value": round(v, 3),
                              "unit": "Mrays/s",
                              "vs_baseline": round(v / NORTH_STAR, 4)}),
                  flush=True)
        except Exception as e:  # noqa: BLE001
            extra[name + "_error"] = f"{type(e).__name__}: {e}"[:300]
            print(json.dumps({"metric": name,
                              "error": extra[name + "_error"]}), flush=True)

    try:
        sponza_mrays = _bench_sponza()
    except Exception as e:  # noqa: BLE001
        sponza_err = f"{type(e).__name__}: {e}"[:500]
        print(json.dumps({"metric": "sponza_1080p_mrays_per_s",
                          "error": sponza_err}), flush=True)

    if sponza_mrays is not None:
        headline = {
            "metric": "sponza_1080p_mrays_per_s",
            "value": round(sponza_mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(sponza_mrays / NORTH_STAR, 4),
            **extra,
        }
        if ks_mrays is not None:
            headline["kitchen_sink_mrays_per_s"] = round(ks_mrays, 3)
        if ks_err:
            headline["kitchen_sink_error"] = ks_err
    elif ks_mrays is not None:
        # sponza crashed: fall back to the kitchen-sink number so the round
        # still records real perf evidence
        headline = {
            "metric": "kitchen_sink_mrays_per_s",
            "value": round(ks_mrays, 3), "unit": "Mrays/s",
            "vs_baseline": round(ks_mrays / NORTH_STAR, 4),
            "sponza_error": sponza_err,
        }
    else:
        headline = {"metric": "sponza_1080p_mrays_per_s", "value": 0.0,
                    "unit": "Mrays/s", "vs_baseline": 0.0,
                    "error": sponza_err, "kitchen_sink_error": ks_err}
    print(json.dumps(headline), flush=True)


if __name__ == "__main__":
    main()
