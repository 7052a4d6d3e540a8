"""Pallas kernel tests (interpreter mode on CPU): the fused sweep must agree
with the XLA reference sweep."""
import pytest

import jax.numpy as jnp
import numpy as np

from scenes import create_test_scene
from solstrale_tpu import RenderConfig
from solstrale_tpu.geo import INF, RAY_T_MIN
from solstrale_tpu.ops.intersect import closest_solid_hit
from solstrale_tpu.ops.pallas_sweep import closest_solid_hit_pallas
from solstrale_tpu.scene.compile import compile_scene


def test_pallas_sweep_matches_xla():
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)

    rng = np.random.default_rng(0)
    n = 1500  # deliberately not a multiple of the block size
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    t_ref, k_ref, i_ref = closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)
    t_pal, k_pal, i_pal = closest_solid_hit_pallas(cs.solids, o, d,
                                                   RAY_T_MIN, INF,
                                                   interpret=True)

    hit_ref = np.isfinite(np.asarray(t_ref))
    hit_pal = np.isfinite(np.asarray(t_pal))
    np.testing.assert_array_equal(hit_ref, hit_pal)
    np.testing.assert_allclose(np.asarray(t_ref)[hit_ref],
                               np.asarray(t_pal)[hit_ref], rtol=1e-5,
                               atol=1e-5)
    same = (np.asarray(k_ref) == np.asarray(k_pal)) & \
        (np.asarray(i_ref) == np.asarray(i_pal))
    assert same[hit_ref].mean() > 0.999


def test_pallas_medium_matches_xla():
    from solstrale_tpu.ops.intersect import medium_hit
    from solstrale_tpu.ops.pallas_sweep import medium_hit_pallas

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    med = cs.media[0]

    rng = np.random.default_rng(1)
    n = 700
    o = jnp.asarray(rng.uniform(-4, 4, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    t_solid = jnp.asarray(rng.uniform(0.5, 20.0, (n,)).astype(np.float32))
    u = jnp.asarray(rng.uniform(0.0, 1.0, (n,)).astype(np.float32))

    ref = np.asarray(medium_hit(med, o, d, t_solid, u))
    pal = np.asarray(medium_hit_pallas(med, o, d, t_solid, u,
                                       interpret=True))
    hit = np.isfinite(ref)
    np.testing.assert_array_equal(hit, np.isfinite(pal))
    np.testing.assert_allclose(ref[hit], pal[hit], rtol=1e-4, atol=1e-4)


def test_pallas_scene_hit_fused_matches_xla():
    """The single-launch scene_hit (solids + medium events) must agree with
    the composed XLA path (closest_solid_hit + per-medium medium_hit)."""
    from solstrale_tpu.ops.intersect import medium_hit
    from solstrale_tpu.ops.pallas_sweep import scene_hit_fused
    from solstrale_tpu.scene.compile import KIND_MEDIUM

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)

    rng = np.random.default_rng(2)
    n = 1300
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    us = tuple(jnp.asarray(rng.uniform(0.0, 1.0, (n,)).astype(np.float32))
               for _ in cs.media)

    t_ref, k_ref, i_ref = closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)
    for m_i, med in enumerate(cs.media):
        t_m = medium_hit(med, o, d, t_ref, us[m_i])
        is_med = t_m < t_ref
        t_ref = jnp.where(is_med, t_m, t_ref)
        k_ref = jnp.where(is_med, KIND_MEDIUM, k_ref)
        i_ref = jnp.where(is_med, m_i, i_ref)

    t_f, k_f, i_f = scene_hit_fused(cs, o, d, us, 1e-3, interpret=True)

    hit_ref = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(hit_ref, np.isfinite(np.asarray(t_f)))
    np.testing.assert_allclose(np.asarray(t_ref)[hit_ref],
                               np.asarray(t_f)[hit_ref], rtol=1e-4,
                               atol=1e-4)
    same = (np.asarray(k_ref) == np.asarray(k_f)) & \
        (np.asarray(i_ref) == np.asarray(i_f))
    assert same[hit_ref].mean() > 0.999


def test_pallas_bvh_matches_brute_force_kitchen_sink():
    """Packet BVH kernel (+ sphere sweep) == brute-force sweep on the
    kitchen-sink scene (all primitive kinds)."""
    from solstrale_tpu.accel import build_kernel_bvh
    from solstrale_tpu.ops.pallas_bvh import bvh_closest_hit_pallas

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    kbvh = build_kernel_bvh(cs.solids)

    rng = np.random.default_rng(5)
    n = 1500
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    t_ref, k_ref, i_ref = closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)
    t_b, k_b, i_b = bvh_closest_hit_pallas(kbvh, cs.solids, o, d,
                                           RAY_T_MIN, INF, interpret=True)

    hit_ref = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(hit_ref, np.isfinite(np.asarray(t_b)))
    np.testing.assert_allclose(np.asarray(t_ref)[hit_ref],
                               np.asarray(t_b)[hit_ref], rtol=1e-5, atol=1e-5)
    same = (np.asarray(k_ref) == np.asarray(k_b)) & \
        (np.asarray(i_ref) == np.asarray(i_b))
    # exact ties (coincident quads in the fixture) resolve by visit order,
    # which differs between table order and Morton order
    assert same[hit_ref].mean() > 0.995


@pytest.mark.slow
def test_pallas_bvh_matches_brute_force_large_mesh():
    """Packet BVH kernel == brute-force sweep on a >100k-triangle mesh
    (sponza-class fixture, camera-like coherent rays + random rays)."""
    from scenes import create_sponza_class_scene
    from solstrale_tpu.ops.pallas_bvh import bvh_closest_hit_pallas

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    # smaller grid than the bench (interpreter-mode runtime) but >100k tris
    cs = compile_scene(create_sponza_class_scene(cfg, n_cells=229))
    assert cs.kbvh is not None
    n_tris = int(np.asarray(cs.solids.tr_valid).sum())
    assert n_tris > 100_000

    rng = np.random.default_rng(6)
    n = 1024
    # half coherent camera-ish rays, half random
    o1 = np.tile(np.array([[0.0, 6.0, 14.0]], np.float32), (n // 2, 1))
    d1 = (np.array([[0.0, -0.35, -1.0]], np.float32)
          + 0.2 * rng.normal(size=(n // 2, 3)).astype(np.float32))
    o2 = rng.uniform(-11, 11, (n // 2, 3)).astype(np.float32)
    d2 = rng.normal(size=(n // 2, 3)).astype(np.float32)
    o = jnp.asarray(np.concatenate([o1, o2]))
    d = jnp.asarray(np.concatenate([d1, d2]))

    t_ref, k_ref, i_ref = closest_solid_hit(cs.solids, o, d, RAY_T_MIN, INF)
    t_b, k_b, i_b = bvh_closest_hit_pallas(cs.kbvh, cs.solids, o, d,
                                           RAY_T_MIN, INF, interpret=True)

    hit_ref = np.isfinite(np.asarray(t_ref))
    np.testing.assert_array_equal(hit_ref, np.isfinite(np.asarray(t_b)))
    np.testing.assert_allclose(np.asarray(t_ref)[hit_ref],
                               np.asarray(t_b)[hit_ref], rtol=1e-4, atol=1e-4)
    same = (np.asarray(k_ref) == np.asarray(k_b)) & \
        (np.asarray(i_ref) == np.asarray(i_b))
    assert same[hit_ref].mean() > 0.999


def test_pallas_bvh_ray_sort_identical():
    """The (origin-cell, direction-octant) ray re-ordering around the
    packet kernel is a pure permutation: results must be bit-identical to
    the unsorted path (R >= 4*BLOCK engages the sort)."""
    import os

    from solstrale_tpu.accel import build_kernel_bvh
    from solstrale_tpu.ops.pallas_bvh import BLOCK, bvh_planar_hit_pallas

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    kbvh = build_kernel_bvh(cs.solids)

    rng = np.random.default_rng(9)
    n = 4 * BLOCK + 37
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    # park a stripe of rays (zero direction) like the queue drain tail
    d = d.at[100:300].set(0.0)

    old = os.environ.get("SOLSTRALE_RAYSORT")
    try:
        os.environ["SOLSTRALE_RAYSORT"] = "0"
        t0, s0 = bvh_planar_hit_pallas(kbvh, o, d, 1e-3, interpret=True)
        os.environ["SOLSTRALE_RAYSORT"] = "1"
        t1, s1 = bvh_planar_hit_pallas(kbvh, o, d, 1e-3, interpret=True)
    finally:
        if old is None:
            os.environ.pop("SOLSTRALE_RAYSORT", None)
        else:
            os.environ["SOLSTRALE_RAYSORT"] = old
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    assert not np.isfinite(np.asarray(t0)[100:300]).any()


def test_pallas_bvh_dirbin_sort_identical():
    """SOLSTRALE_SORT_KEY=dirbin (direction-shape-refined stripes) is also
    a pure permutation: bit-identical to the octant key and the unsorted
    path."""
    import os

    from solstrale_tpu.accel import build_kernel_bvh
    from solstrale_tpu.ops.pallas_bvh import BLOCK, bvh_planar_hit_pallas

    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    kbvh = build_kernel_bvh(cs.solids)

    rng = np.random.default_rng(11)
    n = 4 * BLOCK
    o = jnp.asarray(rng.uniform(-6, 6, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))

    old = os.environ.get("SOLSTRALE_SORT_KEY")
    try:
        os.environ["SOLSTRALE_SORT_KEY"] = "octant"
        t0, s0 = bvh_planar_hit_pallas(kbvh, o, d, 1e-3, interpret=True)
        os.environ["SOLSTRALE_SORT_KEY"] = "dirbin"
        t1, s1 = bvh_planar_hit_pallas(kbvh, o, d, 1e-3, interpret=True)
    finally:
        if old is None:
            os.environ.pop("SOLSTRALE_SORT_KEY", None)
        else:
            os.environ["SOLSTRALE_SORT_KEY"] = old
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
