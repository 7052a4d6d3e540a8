"""Megakernel equivalence (interpreter mode on CPU): the single-launch
render kernel (renderer/megakernel.py) must reproduce the work-queue
wavefront integrator's estimator draw-for-draw — same counter RNG streams,
same material/NEE/clamp-fold semantics (renderer/integrator.py)."""
import jax.numpy as jnp
import numpy as np

from scenes import create_simple_test_scene, create_test_scene
from solstrale_tpu import RenderConfig
from solstrale_tpu.renderer import integrator, megakernel
from solstrale_tpu.scene import (Blend, Bvh, CameraConfig, ConstantMedium,
                                 Dielectric, DiffuseLight, Lambertian, Metal,
                                 Quad, Scene, SolidColor, Sphere, new_box)
from solstrale_tpu.scene.compile import compile_scene


def _mini_kitchen_sink(render_config):
    """Solid-color analogue of the kitchen-sink scene: every material kind
    the megakernel dispatches (lambertian/metal/dielectric/light/blend) plus
    a constant medium and a thin-lens camera."""
    camera = CameraConfig(vertical_fov_degrees=20.0, aperture_size=0.1,
                          look_from=(-5.0, 3.0, 6.0),
                          look_at=(0.25, 1.0, 0.0))
    red = Lambertian(SolidColor(1, 0, 0))
    world = [
        Quad((-5, 0, -15), (20, 0, 0), (0, 0, 20),
             Blend(Lambertian(SolidColor(0.3, 0.6, 0.3)),
                   Metal(SolidColor(0.8, 0.8, 0.9), None, 0.2), 0.4)),
        Sphere((-1, 1, 0), 1.0, Dielectric(SolidColor(1, 1, 1), None, 1.5)),
        ConstantMedium(
            Bvh(new_box((0, 0, 0.5), (1, 2, 1.5), red)), 0.1, (1, 1, 1)),
        Sphere((10, 5, 10), 10.0, DiffuseLight(10, 10, 10)),
        Quad((-1, 10, -1), (2, 0, 0), (0, 0, 2),
             DiffuseLight(12, 12, 12, attenuation_half_length=10.0)),
    ]
    world += new_box((0, 0, -0.5), (1, 2, 0.5), red)
    return Scene(Bvh(world), camera, (0.2, 0.3, 0.5), render_config)


def _compare(scene, width, height, spp, max_depth=8, seed=3, tol=2e-3):
    cs = compile_scene(scene, use_bvh=False)
    assert megakernel.megakernel_supported(
        cs, need_aux=False, shader_kind=integrator.SHADER_PATH)

    ref, segs_ref = integrator.trace_queued(
        cs, None, jnp.int32(1), spp, jnp.int32(seed), width=width,
        height=height, max_depth=max_depth)
    got, segs = megakernel.render_batch_megakernel(
        cs, jnp.int32(1), jnp.int32(spp), jnp.int32(seed), width=width,
        height=height, max_depth=max_depth, interpret=True)

    ref = np.asarray(ref)
    got = np.asarray(got)
    assert got.shape == ref.shape
    # identical RNG draws => near-bit-identical sums (fp reassociation only)
    np.testing.assert_allclose(got, ref, rtol=tol, atol=tol)
    assert float(segs) == float(segs_ref)


def test_megakernel_simple_scene():
    cfg = RenderConfig(width=24, height=16, samples_per_pixel=4)
    _compare(create_simple_test_scene(cfg), 24, 16, 4)


def test_megakernel_kitchen_sink_solid():
    cfg = RenderConfig(width=16, height=12, samples_per_pixel=3)
    _compare(_mini_kitchen_sink(cfg), 16, 12, 3)


def test_megakernel_unsupported_gates():
    cfg = RenderConfig(width=8, height=8, samples_per_pixel=1)
    # kitchen-sink scene carries image textures + normal maps -> wavefront
    cs = compile_scene(create_test_scene(cfg), use_bvh=False)
    assert not megakernel.megakernel_supported(
        cs, need_aux=False, shader_kind=integrator.SHADER_PATH)
    simple = compile_scene(create_simple_test_scene(
        RenderConfig(width=8, height=8, samples_per_pixel=1)), use_bvh=False)
    assert not megakernel.megakernel_supported(
        simple, need_aux=True, shader_kind=integrator.SHADER_PATH)
    assert not megakernel.megakernel_supported(
        simple, need_aux=False, shader_kind=integrator.SHADER_ALBEDO)


def test_megakernel_image_texture_scene():
    """Image-textured scene through the megakernel's u8 SMEM arena: must
    reproduce the wavefront integrator bit-for-bit in estimator structure
    (same RNG) — image texels are u8-exact so the arena round trip is
    lossless. Covers quad identity-uv lookups, triangle interpolated uv
    and spherical uv (sphere.rs:134-140 / texture.rs:167-180)."""
    from solstrale_tpu.scene import ImageMap, Triangle

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    camera = CameraConfig(vertical_fov_degrees=35.0,
                          look_from=(0.0, 1.5, 4.0), look_at=(0, 0.5, 0))
    world = [
        Quad((-3, 0, -3), (6, 0, 0), (0, 0, 6),
             Lambertian(ImageMap(img))),
        Sphere((0.8, 0.8, 0.0), 0.6, Lambertian(SolidColor(0.4, 0.7, 0.9))),
        Triangle((-1.5, 0.0, 1.0), (-0.3, 0.0, 1.0), (-0.9, 1.4, 1.0),
                 Lambertian(ImageMap(img)),
                 uv0=(0.1, 0.1), uv1=(0.9, 0.1), uv2=(0.5, 0.9)),
        Sphere((0, 40, 10), 12.0, DiffuseLight(10, 10, 10)),
    ]
    scene = Scene(Bvh(world), camera, (0.1, 0.1, 0.2),
                  RenderConfig(width=40, height=24, samples_per_pixel=2,
                               seed=3))
    cs = compile_scene(scene, use_bvh=False)
    assert "image_tex" in cs.features
    assert megakernel.megakernel_supported(
        cs, need_aux=False, shader_kind=integrator.SHADER_PATH)
    _compare(scene, 40, 24, 2, max_depth=6)

    # an image-textured SPHERE is supported since round 5 (in-kernel
    # Cephes acos/atan2 spherical uv; test_megakernel_image_textured_sphere
    # covers the equivalence)
    world2 = list(world)
    world2[1] = Sphere((0.8, 0.8, 0.0), 0.6, Lambertian(ImageMap(img)))
    cs2 = compile_scene(Scene(Bvh(world2), camera, (0.1, 0.1, 0.2),
                              RenderConfig(width=8, height=8,
                                           samples_per_pixel=1)),
                        use_bvh=False)
    assert megakernel.megakernel_supported(
        cs2, need_aux=False, shader_kind=integrator.SHADER_PATH)


def test_megakernel_atan_family_accuracy():
    """In-kernel Cephes acos/atan2 (Mosaic has no native lowering) must be
    within ~2e-6 rad of numpy — sub-half-texel for any spherical uv."""
    xs = np.linspace(-1.0, 1.0, 20001, dtype=np.float32)
    got = np.asarray(megakernel._acos(jnp.asarray(xs)))
    np.testing.assert_allclose(got, np.arccos(xs.astype(np.float64)),
                               atol=4e-6)
    ys = np.linspace(-3.0, 3.0, 301, dtype=np.float32)
    Y, X = np.meshgrid(ys, ys)
    keep = (np.abs(X) + np.abs(Y)) > 1e-6
    got2 = np.asarray(megakernel._atan2(jnp.asarray(Y[keep]),
                                        jnp.asarray(X[keep])))
    np.testing.assert_allclose(
        got2, np.arctan2(Y[keep].astype(np.float64),
                         X[keep].astype(np.float64)), atol=4e-6)


def test_megakernel_image_textured_sphere():
    """Image-textured SPHERE through the megakernel: spherical uv comes
    from the in-kernel acos/atan2 polynomials. Draw-for-draw equivalent to
    the wavefront integrator except where the ~1e-6-rad uv difference
    flips a nearest-texel decision at a texel boundary — allow a <0.5%
    pixel fraction for those."""
    from solstrale_tpu.scene import ImageMap

    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (8, 8, 3), np.uint8)
    camera = CameraConfig(vertical_fov_degrees=30.0,
                          look_from=(0.0, 0.8, 4.0), look_at=(0, 0.5, 0))
    world = [
        Sphere((0.0, 0.6, 0.0), 0.9, Lambertian(ImageMap(img))),
        Quad((-4, -0.4, -4), (8, 0, 0), (0, 0, 8),
             Lambertian(SolidColor(0.5, 0.5, 0.5))),
        Sphere((0, 40, 10), 12.0, DiffuseLight(10, 10, 10)),
    ]
    scene = Scene(Bvh(world), camera, (0.1, 0.1, 0.2),
                  RenderConfig(width=40, height=24, samples_per_pixel=2,
                               seed=3))
    cs = compile_scene(scene, use_bvh=False)
    assert "sphere_image_tex" in cs.features
    assert megakernel.megakernel_supported(
        cs, need_aux=False, shader_kind=integrator.SHADER_PATH)

    ref, segs_ref = integrator.trace_queued(
        cs, None, jnp.int32(1), 2, jnp.int32(3), width=40, height=24,
        max_depth=8)
    got, segs = megakernel.render_batch_megakernel(
        cs, jnp.int32(1), jnp.int32(2), jnp.int32(3), width=40, height=24,
        max_depth=8, interpret=True)
    ref = np.asarray(ref)
    got = np.asarray(got)
    assert float(segs) == float(segs_ref)
    mismatch = (np.abs(got - ref) > 2e-3 * (np.abs(ref) + 1.0)).mean()
    assert mismatch < 0.005, mismatch
