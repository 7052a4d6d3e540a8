#!/usr/bin/env python
"""Real-TPU compile + golden smoke gate for every shipped Pallas kernel.

The CPU test suite runs the kernels in interpreter mode only, which has no
VMEM limits and synchronous DMA — exactly the class of failure (compile-time
VMEM OOM, runtime DMA deadlock) that sank round 2's bench. This gate runs on
the actual chip:

1. AOT-compiles `bvh_planar_hit_pallas` at the sponza bench shape (262k
   prims), `closest_solid_hit_pallas` / `scene_hit_fused` at the
   kitchen-sink shape, and the render megakernel — VMEM OOMs surface here at
   compile time, not bench time.
2. Runs each once (catches runtime deadlocks with a watchdog budget).
3. Renders one 64x64 golden (simple scene) end-to-end with compiled kernels
   and compares against the reference golden at the 0.95 bar
   (integration_tests.rs:326-350 procedure).

Writes TPU_SMOKE.json at the repo root. Wire-up: `make tpu-smoke` (run
under the axon tunnel); CI skips it off-TPU.
"""
import json
import os
import sys
import time
import traceback

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

RESULTS = {"backend": None, "checks": {}, "ok": False}


def check(name):
    def deco(fn):
        def run():
            t0 = time.time()
            try:
                detail = fn()
                RESULTS["checks"][name] = {
                    "ok": True, "seconds": round(time.time() - t0, 1),
                    **(detail or {})}
                print(f"[tpu-smoke] {name}: OK "
                      f"({RESULTS['checks'][name]['seconds']}s)", flush=True)
            except Exception as e:  # noqa: BLE001 — gate must report, not die
                RESULTS["checks"][name] = {
                    "ok": False, "seconds": round(time.time() - t0, 1),
                    "error": f"{type(e).__name__}: {e}"[:800]}
                traceback.print_exc()
                print(f"[tpu-smoke] {name}: FAIL", flush=True)
        return run
    return deco


@check("bvh_kernel_sponza_shape")
def check_bvh():
    """Compile + run the packet BVH kernel at the 262k-prim bench shape."""
    from scenes import create_sponza_class_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.ops.pallas_bvh import bvh_planar_hit_pallas
    from solstrale_tpu.renderer import integrator
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=1920, height=1080, samples_per_pixel=1, seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))
    pix = jnp.arange(65536, dtype=jnp.int32)
    _, o, d = integrator.camera_rays(cs, pix, 1920, 1080, jnp.int32(1),
                                     jnp.int32(1))
    fn = jax.jit(lambda k, o, d: bvh_planar_hit_pallas(k, o, d, 0.001))
    fn.lower(cs.kbvh, o, d).compile()  # VMEM OOM surfaces here
    t, _ = fn(cs.kbvh, o, d)
    t = np.asarray(t)
    assert np.isfinite(t).any()
    return {"prims": int(cs.solids.pl_n.shape[0]),
            "hit_frac": round(float(np.isfinite(t).mean()), 4)}


@check("fused_sweep_kitchen_sink_shape")
def check_sweep():
    """Compile + run scene_hit_fused (solids + media) at the bench shape."""
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.ops.pallas_sweep import scene_hit_fused
    from solstrale_tpu.renderer import integrator
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=400, height=266, samples_per_pixel=1, seed=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    from solstrale_tpu.geo import soa

    pix = jnp.arange(131072, dtype=jnp.int32)
    _, o, d = integrator.camera_rays(cs, pix, 400, 266, jnp.int32(1),
                                     jnp.int32(1))
    o, d = soa.to_aos(o), soa.to_aos(d)
    u = tuple(jnp.full((131072,), 0.5, jnp.float32) for _ in cs.media)
    fn = jax.jit(lambda cs, o, d, u: scene_hit_fused(cs, o, d, u, 0.001))
    fn.lower(cs, o, d, u).compile()
    t, _, _ = fn(cs, o, d, u)
    t = np.asarray(t)
    assert np.isfinite(t).any()
    return {"hit_frac": round(float(np.isfinite(t).mean()), 4)}


@check("megakernel_compile")
def check_megakernel():
    """Compile + run the single-launch render megakernel on its supported
    scene class."""
    from scenes import create_simple_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.renderer import megakernel
    from solstrale_tpu.scene.compile import compile_scene

    cfg = RenderConfig(width=64, height=64, samples_per_pixel=2, seed=1)
    cs = compile_scene(create_simple_test_scene(cfg))
    if not megakernel.megakernel_supported(cs, need_aux=False, shader_kind=0):
        return {"skipped": "scene not megakernel-supported"}
    color, segs = megakernel.render_batch_megakernel(
        cs, jnp.int32(1), jnp.int32(2), jnp.int32(1), width=64, height=64,
        max_depth=8)
    color = np.asarray(color)
    assert np.isfinite(color).all() and float(segs) > 0
    return {"segments": float(segs)}


@check("golden_simple_scene_on_tpu")
def check_golden():
    """End-to-end 128x128 simple-scene render with COMPILED kernels vs the
    reference golden at the 0.95 blur-compare bar."""
    from scenes import create_simple_test_scene
    from solstrale_tpu import Renderer, RenderConfig
    from solstrale_tpu.utils import compare_images_rms
    from PIL import Image

    scene = create_simple_test_scene(
        RenderConfig(width=128, height=64, samples_per_pixel=25, seed=7))
    img = Renderer(scene).render_final()
    # the reference exercises this scene through its OIDN golden
    # (integration_tests.rs:47-61)
    expected = np.asarray(Image.open(
        "/root/reference/tests/output/out_expected_oidn.jpg")
        .convert("RGB"))
    score = compare_images_rms(np.asarray(img), expected)
    assert score > 0.95, f"golden score {score}"
    return {"score": round(float(score), 4)}


@check("golden_bvh_scene_on_tpu")
def check_golden_bvh():
    """Kitchen-sink scene FORCED through the LBVH + packet-BVH kernel on
    the chip, vs the reference pathTracing golden — catches Mosaic-vs-XLA
    numeric drift in the traversal kernel that CPU interpret mode cannot
    (integration_tests.rs:26-45 procedure)."""
    from scenes import create_test_scene
    from solstrale_tpu import Renderer, RenderConfig
    from solstrale_tpu.scene.compile import compile_scene
    from solstrale_tpu.utils import compare_images_rms
    from PIL import Image

    scene = create_test_scene(
        RenderConfig(width=200, height=100, samples_per_pixel=50, seed=1))
    r = Renderer(scene)
    r.compiled = compile_scene(scene, use_bvh=True)
    assert r.compiled.kbvh is not None
    img = r.render_final()
    expected = np.asarray(Image.open(
        "/root/reference/tests/output/out_expected_pathTracing.jpg")
        .convert("RGB"))
    score = compare_images_rms(np.asarray(img), expected)
    assert score > 0.95, f"golden score {score}"
    return {"score": round(float(score), 4)}


@check("golden_image_texture_on_tpu")
def check_golden_uv():
    """Image-textured scene (uv mapping incl. negative/wrapping uvs) with
    compiled kernels vs the reference uv golden
    (integration_tests.rs:100-111)."""
    from scenes import create_uv_scene
    from solstrale_tpu import Renderer, RenderConfig
    from solstrale_tpu.utils import compare_images_rms
    from PIL import Image

    scene = create_uv_scene(
        RenderConfig(width=128, height=128, samples_per_pixel=5, seed=1))
    img = Renderer(scene).render_final()
    expected = np.asarray(Image.open(
        "/root/reference/tests/output/out_expected_uv.jpg").convert("RGB"))
    score = compare_images_rms(np.asarray(img), expected)
    assert score > 0.95, f"golden score {score}"
    return {"score": round(float(score), 4)}


@check("gradient_on_tpu")
def check_gradient():
    """jax.grad through the COMPILED Pallas forward on the real chip: the
    detached-geometry custom_vjp (ops/detached.py) supplies the kernel
    backward. Verifies finite, non-zero texture gradients and one central
    finite-difference probe (BASELINE.json pixel-gradient requirement, on
    hardware)."""
    from scenes import create_simple_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.diff import render_linear, set_texture_params
    from solstrale_tpu.scene.compile import compile_scene

    w, h = 32, 16
    cs = compile_scene(create_simple_test_scene(
        RenderConfig(width=w, height=h, samples_per_pixel=1, seed=1)))
    params = cs.textures.pixels

    def f(p):
        img = render_linear(set_texture_params(cs, p), width=w, height=h,
                            max_depth=4, n_samples=1, seed=1)
        return jnp.sum(img)

    fj = jax.jit(f)
    g = np.asarray(jax.jit(jax.grad(f))(params))
    assert np.isfinite(g).all(), "non-finite gradient"
    assert (np.abs(g) > 0).any(), "all-zero gradient"
    eps = 1e-2
    i, c = 0, 0
    fd = (float(fj(params.at[i, c].add(eps)))
          - float(fj(params.at[i, c].add(-eps)))) / (2 * eps)
    rel = abs(g[i, c] - fd) / max(abs(fd), 1e-6)
    assert rel < 0.05, f"grad {g[i, c]} vs fd {fd} (rel {rel:.3f})"
    return {"grad_nonzero_frac": round(float((np.abs(g) > 0).mean()), 4),
            "fd_rel_err": round(float(rel), 5)}


def main():
    RESULTS["backend"] = jax.default_backend()
    if RESULTS["backend"] == "cpu":
        print("[tpu-smoke] no TPU backend — skipping (gate requires the "
              "axon tunnel)", flush=True)
        RESULTS["ok"] = None
        RESULTS["skipped"] = "cpu backend"
    else:
        for c in (check_bvh, check_sweep, check_megakernel, check_golden,
                  check_golden_bvh, check_golden_uv, check_gradient):
            c()
        RESULTS["ok"] = all(v["ok"] for v in RESULTS["checks"].values())
    out = os.path.join(REPO, "TPU_SMOKE.json")
    with open(out, "w") as f:
        json.dump(RESULTS, f, indent=1)
    print(f"[tpu-smoke] wrote {out}: ok={RESULTS['ok']}", flush=True)
    return 0 if RESULTS["ok"] in (True, None) else 1


if __name__ == "__main__":
    sys.exit(main())
