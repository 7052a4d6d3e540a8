"""TPU benchmark: packet-BVH kernel vs brute-force fused sweep.

Mirrors the reference's criterion matrix (benches/solstrale_benchmark.rs:
16-67: bvh on/off x triangle count) at wavefront scale, plus the
sponza-class mesh. Rays are primary camera rays (coherent) and
bounce-like random rays (incoherent).

Usage: python tools/bench_bvh.py [n_rays]
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
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def camera_rays(cs, n, width=1920, height=1080):
    from solstrale_tpu.renderer import integrator

    pix = jnp.arange(n, dtype=jnp.int32) % (width * height)
    _, o, d = integrator.camera_rays(cs, pix, width, height, jnp.int32(1),
                                     jnp.int32(1))
    return o, d


def random_rays(n, spread, seed=0):
    rng = np.random.default_rng(seed)
    o = jnp.asarray(rng.uniform(-spread, spread, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    return o, d


def time_fn(fn, *args, iters=5):
    out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])  # force completion (axon)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    np.asarray(jax.tree.leaves(out)[0])
    return (time.perf_counter() - t0) / iters


def main():
    from scenes import create_sponza_class_scene, new_bvh_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.accel import build_kernel_bvh
    from solstrale_tpu.geo import INF, RAY_T_MIN
    from solstrale_tpu.ops import intersect
    from solstrale_tpu.ops.pallas_bvh import bvh_closest_hit_pallas
    from solstrale_tpu.ops.pallas_sweep import closest_solid_hit_pallas
    from solstrale_tpu.scene.compile import compile_scene

    n_rays = int(sys.argv[1]) if len(sys.argv) > 1 else 131072
    cfg = RenderConfig(width=64, height=36, samples_per_pixel=1)

    cases = []
    for n_tris in (10, 10_000):
        cs = compile_scene(new_bvh_test_scene(cfg, False, n_tris),
                           use_bvh=False)
        cases.append((f"tri{n_tris}", cs, 160.0))
    t0 = time.perf_counter()
    cs_big = compile_scene(create_sponza_class_scene(cfg))
    print(f"# sponza-class compile: {time.perf_counter()-t0:.2f}s")
    cases.append(("sponza262k", cs_big, 11.0))

    print(f"# n_rays={n_rays}")
    print(f"{'scene':>12} {'rays':>10} {'brute_ms':>9} {'bvh_coh_ms':>10} "
          f"{'bvh_inc_ms':>10} {'speedup_coh':>11}")
    for name, cs, spread in cases:
        kbvh = cs.kbvh if cs.kbvh is not None else build_kernel_bvh(cs.solids)
        o_c, d_c = camera_rays(cs, n_rays)
        o_r, d_r = random_rays(n_rays, spread)

        n_pl = int(np.asarray(cs.solids.pl_valid).sum())
        brute_scale = 1.0
        if n_pl <= 2000:
            # fused-sweep kernel (SMEM prim tables cap at ~2k planar prims)
            def brute(o, d):
                return closest_solid_hit_pallas(cs.solids, o, d,
                                                RAY_T_MIN, INF)
        else:
            # XLA MXU-form sweep (chunked (R,P) matmuls); cap rays so the
            # (R, CHUNK) temporaries fit HBM at huge prim counts, scale time
            brute_rays = min(n_rays, 16384 if n_pl > 50_000 else n_rays)
            brute_scale = n_rays / brute_rays
            os.environ["SOLSTRALE_PALLAS"] = "0"

            @jax.jit
            def brute(o, d):
                return intersect.closest_solid_hit(
                    cs.solids, o[:brute_rays], d[:brute_rays],
                    RAY_T_MIN, INF)

            brute(o_c, d_c)  # trace with pallas disabled
            os.environ["SOLSTRALE_PALLAS"] = "auto"

        def bvh(o, d):
            return bvh_closest_hit_pallas(kbvh, cs.solids, o, d,
                                          RAY_T_MIN, INF)

        # correctness spot check on coherent rays
        tb, kb, ib = brute(o_c, d_c)
        tv, kv, iv = bvh(o_c, d_c)
        hb = np.isfinite(np.asarray(tb))
        hv = np.isfinite(np.asarray(tv))[:hb.shape[0]]
        assert (hb == hv).mean() > 0.9999, (name, (hb != hv).sum())

        ms_b = time_fn(brute, o_c, d_c,
                       iters=1 if n_pl > 50_000 else 5) * 1e3 * (
            brute_scale if n_pl > 2000 else 1.0)
        ms_v = time_fn(bvh, o_c, d_c) * 1e3
        ms_vr = time_fn(bvh, o_r, d_r) * 1e3
        print(f"{name:>12} {n_rays:>10} {ms_b:>9.2f} {ms_v:>10.2f} "
              f"{ms_vr:>10.2f} {ms_b/ms_v:>11.1f}x")


if __name__ == "__main__":
    main()
