"""Standalone TPU micro-benchmark: Pallas fused sweep vs XLA MXU sweep.

python tools/bench_pallas.py [n_rays]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main():
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.geo import INF, RAY_T_MIN
    from solstrale_tpu.ops.intersect import closest_solid_hit
    from solstrale_tpu.ops.pallas_sweep import closest_solid_hit_pallas
    from solstrale_tpu.scene.compile import compile_scene

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    n_prims = int(cs.solids.sph_valid.sum() + cs.solids.pl_valid.sum())

    rng = np.random.default_rng(0)
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    f_xla = jax.jit(lambda o, d: closest_solid_hit(cs.solids, o, d,
                                                   RAY_T_MIN, INF)[0])
    f_pal = jax.jit(lambda o, d: closest_solid_hit_pallas(cs.solids, o, d,
                                                          RAY_T_MIN, INF)[0])

    for name, fn in [("xla_mxu_sweep", f_xla), ("pallas_fused_sweep", f_pal)]:
        t_val = np.asarray(fn(o, d))  # compile + run
        t0 = time.perf_counter()
        iters = 10
        for _ in range(iters):
            t_val = np.asarray(fn(o, d))
        dt = (time.perf_counter() - t0) / iters
        mrays = n / dt / 1e6
        hits = np.isfinite(t_val).mean()
        print(f"{name:22s} {dt * 1e3:8.2f} ms  {mrays:10.1f} Mray-tests/s "
              f"({n_prims} prims, hit-rate {hits:.2f})")


if __name__ == "__main__":
    main()
