"""Ablation profiler: times the integrator's per-bounce components on the
current backend to locate bottlenecks. Run on TPU (default env) or CPU.

Usage: python tools/profile_tpu.py [width height spp]
"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(name, fn, *args, iters=3):
    np.asarray(fn(*args))  # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        out = np.asarray(fn(*args))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:40s} {dt * 1e3:9.2f} ms")
    return dt


def main():
    from scenes import create_test_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.ops.intersect import (closest_solid_hit,
                                             hit_attributes,
                                             light_pdf_values, onehot_matmul)
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    width = int(sys.argv[1]) if len(sys.argv) > 1 else 400
    height = int(sys.argv[2]) if len(sys.argv) > 2 else 266
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg))
    n = width * height
    pix = jnp.arange(n, dtype=jnp.int32)
    _, o, d = I.camera_rays(cs, pix, width, height, jnp.int32(1), jnp.int32(1))
    o, d = np.asarray(o), np.asarray(d)
    o, d = jnp.asarray(o), jnp.asarray(d)
    print(f"rays={n}  spheres={cs.solids.sph_valid.sum()}  "
          f"planar={cs.solids.pl_valid.sum()}")

    f_hit = jax.jit(lambda o, d: closest_solid_hit(cs.solids, o, d, 1e-3,
                                                   jnp.inf))
    t_hit = timeit("closest_solid_hit (1 sweep)", f_hit, o, d)

    t, kind, idx = f_hit(o, d)
    t_ = jnp.where(jnp.isfinite(t), t, 0.0)
    f_attr = jax.jit(lambda: hit_attributes(cs.solids, o, d, t_, kind, idx))
    timeit("hit_attributes (one-hot)", f_attr)

    attrs = f_attr()
    f_scat = jax.jit(lambda: I.scatter(cs, o, d, attrs, pix, jnp.int32(1),
                                       jnp.int32(0), jnp.int32(1))["new_dir"])
    timeit("scatter (full material dispatch)", f_scat)

    f_lpdf = jax.jit(lambda: light_pdf_values(cs.lights, attrs["point"], d))
    timeit("light_pdf_values", f_lpdf)

    f_tex = jax.jit(lambda: I.sample_texture(
        cs.textures, jnp.zeros(n, jnp.int32), attrs["uv"]))
    timeit("sample_texture (arena gather)", f_tex)

    def full_step():
        carry = (o, d, o[:, 0] == o[:, 0], o[:, 0] * 0, o * 0, o[:, 0] * 0,
                 o[:, 0] * 0)
        carry, tape = I.bounce_step(cs, carry, jnp.int32(0), pix,
                                    jnp.int32(1), jnp.int32(1))
        return carry[0]

    t_step = timeit("bounce_step (everything, 1 bounce)", jax.jit(full_step))

    kw = dict(width=width, height=height, max_depth=50, shader_kind=0,
              need_aux=False)
    f_sample = jax.jit(lambda: I.render_sample(cs, jnp.int32(1), jnp.int32(1),
                                               **kw)[0])
    t_samp = timeit("render_sample (full, depth 50)", f_sample, iters=1)
    print(f"\nimplied bounce iterations: {t_samp / t_step:.1f} "
          f"(while_loop runs until ALL rays dead, cap 50)")


if __name__ == "__main__":
    main()
