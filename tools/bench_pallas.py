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

    iters = 20

    def bench(name, hit_fn):
        @jax.jit
        def run(c0):
            def body(i, c):
                t = hit_fn(o + c * 1e-12, d)
                return c + jnp.sum(jnp.where(jnp.isfinite(t), t, 0.0)) * 1e-12

            return jax.lax.fori_loop(0, iters, body, c0)

        float(run(jnp.float32(0.0)))  # compile + warmup
        t0 = time.perf_counter()
        float(run(jnp.float32(1.0)))
        dt = (time.perf_counter() - t0) / iters
        mrays = n / dt / 1e6
        print(f"{name:22s} {dt * 1e3:8.2f} ms  {mrays:10.1f} Mray-sweeps/s "
              f"({n_prims} prims)")

    import os

    os.environ["SOLSTRALE_PALLAS"] = "0"  # force the XLA path for baseline
    bench("xla_mxu_sweep",
          lambda o, d: closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)[0])
    bench("pallas_fused_sweep",
          lambda o, d: closest_solid_hit_pallas(cs.solids, o, d,
                                                RAY_T_MIN, INF)[0])

    # value equivalence on this backend
    t_x = np.asarray(jax.jit(lambda: closest_solid_hit(
        cs.solids, o, d, RAY_T_MIN, INF)[0])())
    t_p = np.asarray(jax.jit(lambda: closest_solid_hit_pallas(
        cs.solids, o, d, RAY_T_MIN, INF)[0])())
    hit = np.isfinite(t_x)
    agree = np.array_equal(hit, np.isfinite(t_p)) and \
        np.allclose(t_x[hit], t_p[hit], rtol=1e-3, atol=1e-3)
    print(f"value equivalence (pallas vs xla): {'OK' if agree else 'MISMATCH'}")


if __name__ == "__main__":
    main()
