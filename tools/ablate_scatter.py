"""Time the pieces of the per-bounce shading stage (attrs + scatter) on
sponza-shaped inputs. Every number includes the ~0.8 ms per-fori-iteration
dispatch floor — compare DIFFERENCES, not absolutes.
Usage: python tools/ablate_scatter.py [iters]"""
import sys
import time

sys.path.insert(0, ".")
sys.path.insert(0, "tests")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    from scenes import create_sponza_class_scene
    from solstrale_tpu import RenderConfig
    from solstrale_tpu.geo import soa
    from solstrale_tpu.ops import rng
    from solstrale_tpu.ops.intersect import (hit_attributes_soa,
                                             light_pdf_mean3,
                                             sample_light_direction3)
    from solstrale_tpu.renderer import integrator as I
    from solstrale_tpu.scene.compile import compile_scene

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    lanes = 131072
    width, height = 1920, 1080
    cfg = RenderConfig(width=width, height=height, samples_per_pixel=1,
                       seed=1)
    cs = compile_scene(create_sponza_class_scene(cfg))

    pix = jnp.arange(lanes, dtype=jnp.int32)

    @jax.jit
    def gen():
        _, o, d = I.camera_rays(cs, pix, width, height, jnp.int32(0),
                                jnp.int32(1))
        t, kind, idx = I.scene_hit(cs, o, d, pix, 0, 0, 1)
        ts = jnp.where(jnp.isfinite(t), t, 0.0)
        attrs = I.full_hit_attributes(cs, o, d, ts, kind, idx, pix, 0, 0, 1)
        return o, d, ts, kind, idx, attrs

    o, d, ts, kind, idx, attrs0 = gen()
    attrs0 = dict(attrs0)

    def timed(name, body):
        @jax.jit
        def run(seed):
            return jax.lax.fori_loop(0, iters, body, seed)

        float(run(jnp.float32(0.0)))
        t0 = time.perf_counter()
        float(run(jnp.float32(1.0)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:40s} {dt * 1e3:9.3f} ms/iter (incl ~0.8 floor)",
              flush=True)

    def perturb(c):
        return tuple(p + c * 1e-12 for p in attrs0["point"])

    # empty floor reference
    timed("floor (10-op chain)", lambda i, c: c * 1.0000001 + 1e-9)

    # attrs (specialized, has_spheres=False)
    def b_attrs(i, c):
        a = hit_attributes_soa(cs.solids, o, d, ts + c * 1e-12, kind, idx,
                               has_spheres=False)
        return c + jnp.sum(a["normal"][0]) * 1e-12
    timed("hit_attributes (no spheres)", b_attrs)

    # full scatter
    def b_scatter(i, c):
        a = dict(attrs0); a["point"] = perturb(c)
        sc = I.scatter(cs, o, d, a, pix, 0, i, 1)
        return c + jnp.sum(sc["new_dir"][0]) * 1e-12
    timed("scatter FULL", b_scatter)

    # rng draws alone (the 4 uniform4/uniform in the lambertian path)
    def b_rng(i, c):
        r1, r2, _, _ = rng.uniform4(pix, i, 0, rng.P_COSINE, 1)
        u_pick = rng.uniform(pix, i, 0, rng.P_LIGHT_PICK, 1)
        l1, l2, _, _ = rng.uniform4(pix, i, 0, rng.P_LIGHT_SAMPLE, 1)
        u_coin = rng.uniform(pix, i, 0, rng.P_MIX_COIN, 1)
        return c + jnp.sum(r1 + u_pick + l1 + u_coin) * 1e-12
    timed("rng draws (4x)", b_rng)

    # texture fetches alone (albedo + normal map)
    def b_tex(i, c):
        uv = (attrs0["uv"][0] + c * 1e-12, attrs0["uv"][1])
        a = I.sample_texture(cs.textures, jnp.zeros_like(kind), uv)
        n = I.sample_texture(cs.textures, jnp.ones_like(kind), uv)
        return c + jnp.sum(a[0] + n[0]) * 1e-12
    timed("texture fetches (2x)", b_tex)

    # light pdf + sampling alone
    def b_light(i, c):
        pt = perturb(c)
        ld = sample_light_direction3(cs.lights, pt, jnp.zeros_like(kind),
                                     ts, ts, kinds=cs.light_kinds)
        lv = light_pdf_mean3(cs.lights, pt, ld, kinds=cs.light_kinds)
        return c + jnp.sum(lv) * 1e-12
    timed("light sample+pdf", b_light)

    # shading normal (normal-map path) alone
    def b_snormal(i, c):
        a = dict(attrs0); a["point"] = perturb(c)
        a["uv"] = (attrs0["uv"][0] + c * 1e-12, attrs0["uv"][1])
        n = I.shading_normal_of(cs, attrs0["mat"], a)
        return c + jnp.sum(n[0]) * 1e-12
    timed("shading normal (normal map)", b_snormal)

    # onb + cosine + unit chain alone
    def b_dirs(i, c):
        n = tuple(p + c * 1e-12 for p in attrs0["normal"])
        ct, cb, cn = soa.onb_from_w3(n)
        r1, r2 = attrs0["uv"]
        cd = soa.onb_local3(ct, cb, cn, rng.cosine_direction3(r1, r2))
        u = soa.unit3(cd)
        return c + jnp.sum(u[0]) * 1e-12
    timed("onb/cosine/unit chain", b_dirs)


if __name__ == "__main__":
    main()
