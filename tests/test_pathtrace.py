"""Path-traced global illumination (render/pathtrace.py).

The estimator's structure makes sharp tests possible without RNG
tolerance games:

  * cosine-weighted sampling under a CONSTANT environment is
    zero-variance — every path carries exactly albedo^k * E — so the
    furnace test asserts near-exact equality, not a statistical bound;
  * sampling is a pure hash of (ray, sample, depth), so images are
    bitwise deterministic and scheduler-independent.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.config import (
    CameraConfig,
    LightConfig,
    MaterialConfig,
    SceneConfig,
)
from ray_tracer_tpu.models import meshes as mesh_gen
from ray_tracer_tpu.models.scenes import scene_from_meshes
from ray_tracer_tpu.render.renderer import prepare, render

E = 100.0  # constant environment radiance (0-255 units)
RHO = 0.5  # plane albedo


def _furnace_prep(scheduler="persistent", gi_depth=1, gi_samples=2,
                  intensity=0.0, **render_kw):
    """A lone ground plane under a constant environment: every bounce
    ray escapes upward, so radiance is exactly direct + rho * E."""
    plane = mesh_gen.make_plane(extent=8.0, y=-1.0, density=2)
    mats = (MaterialConfig(base_color=(255.0 * RHO,) * 3),)
    light = LightConfig(position=(0.0, 5.0, 0.0), intensity=intensity)
    scene = scene_from_meshes([(plane, 0)], mats, light)
    scene = scene._replace(
        env_image=jnp.broadcast_to(
            jnp.asarray([E, E, E], jnp.float32), (4, 8, 3)
        )
    )
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 3.0, 0.0),
                            target=(0.1, -1.0, 0.1), width=16, height=16),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler=scheduler, wave=128, ray_tile=64,
            gi_samples=gi_samples, gi_depth=gi_depth, **render_kw,
        ),
    )
    return prepare(cfg, scene=scene)


@pytest.mark.parametrize("scheduler", ["persistent", "tiled"])
def test_furnace_plane_exact(scheduler):
    """rho * E on every pixel, to float tolerance: with a constant
    environment the cosine-weighted estimator is zero-variance (the
    BRDF x cos / pdf weight is albedo for EVERY sampled direction)."""
    img = np.asarray(render(_furnace_prep(scheduler)))
    np.testing.assert_allclose(img, RHO * E, rtol=1e-5)


def test_furnace_two_bounces_still_exact():
    """Extra depth adds nothing on an open plane (all bounce rays
    escape on the first try) — pins that dead paths contribute zero."""
    img = np.asarray(render(_furnace_prep(gi_depth=3)))
    np.testing.assert_allclose(img, RHO * E, rtol=1e-5)


def test_direct_term_matches_analytic():
    """gi_depth=0 leaves only next-event estimation: an unoccluded
    Lambertian plane under a point light must equal
    rho/pi * I * cos / r^2 computed analytically per pixel."""
    prep = _furnace_prep(gi_depth=0, gi_samples=1, intensity=300.0)
    # kill the environment so only the NEE term remains
    prep = prep._replace(scene=prep.scene._replace(env_image=None))
    img = np.asarray(render(prep))

    from ray_tracer_tpu.ops.camera import camera_rays

    rays = camera_rays(prep.cfg.camera)
    o = np.asarray(rays.orig)
    d = np.asarray(rays.dirn)
    t = (-1.0 - o[:, 1]) / d[:, 1]  # plane y = -1
    poi = o + d * t[:, None]
    lp = np.asarray([0.0, 5.0, 0.0])
    to_l = lp - poi
    r2 = (to_l ** 2).sum(-1)
    cos_i = np.maximum(to_l[:, 1] / np.sqrt(r2), 0.0)  # n = +y
    want = (RHO / np.pi * 300.0 * cos_i / r2)[:, None] * np.ones(3)
    np.testing.assert_allclose(
        img.reshape(-1, 3), want, rtol=1e-4, atol=1e-4
    )


def test_deterministic_and_scheduler_independent():
    """Hash-driven sampling: identical images across runs AND across
    schedulers (the persistent wave and the tiled march trace the same
    paths) on a scene with real occlusion."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(12, 12)
    base = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed", ray_tile=144,
            wave=128, gi_samples=2, gi_depth=2,
        ),
    )
    imgs = {}
    for sched in ("persistent", "tiled"):
        c = dataclasses.replace(
            base, render=dataclasses.replace(base.render, scheduler=sched)
        )
        prep = prepare(c, scene=scene)
        a = np.asarray(render(prep))
        b = np.asarray(render(prep))
        np.testing.assert_array_equal(a, b)  # run-to-run
        imgs[sched] = a
    np.testing.assert_array_equal(imgs["persistent"], imgs["tiled"])


def test_fused_nee_matches_separate():
    """gi_fuse_nee folds the NEE shadow query into the segment's march
    (retire/rearm); visibility is the same exists-a-blocker predicate,
    so the image matches the separate-traversal path on a scene with
    real occlusion."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(16, 16)
    base = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=128, gi_samples=2, gi_depth=2,
        ),
    )
    imgs = {}
    for fuse in (True, False):
        c = dataclasses.replace(
            base, render=dataclasses.replace(base.render, gi_fuse_nee=fuse)
        )
        imgs[fuse] = np.asarray(render(prepare(c, scene=scene)))
    np.testing.assert_array_equal(imgs[True], imgs[False])


def test_gi_sharded_equals_single(eight_device_mesh):
    """GI shards over rays like every other feature, bitwise: the
    sample key hashes the ray itself (not its batch index), so padding,
    the balance permutation and sharding change nothing."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.parallel.shard import render_sharded

    scene, cfg = gradcheck_scene(12, 12)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=64, gi_samples=2, gi_depth=2,
        ),
    )
    prep = prepare(cfg, scene=scene)
    single = np.asarray(render(prep))
    sharded = np.asarray(render_sharded(prep, mesh=eight_device_mesh))
    np.testing.assert_array_equal(single, sharded)


def test_indirect_light_reaches_shadowed_pixels():
    """The point of GI: pixels whose direct term is fully occluded gain
    energy from bounce light."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(24, 24)
    scene = scene._replace(light_intensity=jnp.asarray(3000.0, jnp.float32))

    def img_at(depth):
        c = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render, faithful=False, traversal="packed",
                scheduler="persistent", wave=256, gi_samples=4,
                gi_depth=depth,
            ),
        )
        return np.asarray(render(prepare(c, scene=scene)))

    direct = img_at(0)
    gi = img_at(2)
    # energy only increases (all terms are non-negative additions)
    assert gi.sum() > direct.sum()
    # some pixel that is BLACK under direct-only (hit but fully
    # shadowed, and no environment) is lit by indirect light
    dark = direct.max(axis=-1) < 1e-6
    assert dark.any(), "scene should have fully-shadowed pixels"
    assert gi.max(axis=-1)[dark].max() > 0.1


def _mirror_prep(km, reflective=True, rho=RHO, **kw):
    """Furnace plane with a reflective material: primary hits the plane,
    the mirror branch reflects UP and escapes to the constant env."""
    plane = mesh_gen.make_plane(extent=8.0, y=-1.0, density=2)
    mats = (MaterialConfig(base_color=(255.0 * rho,) * 3, km=km,
                           reflective=reflective),)
    light = LightConfig(position=(0.0, 5.0, 0.0), intensity=0.0)
    scene = scene_from_meshes([(plane, 0)], mats, light)
    scene = scene._replace(
        env_image=jnp.broadcast_to(
            jnp.asarray([E, E, E], jnp.float32), (4, 8, 3)
        )
    )
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 3.0, 0.0),
                            target=(0.1, -1.0, 0.1), width=16, height=16),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=128, ray_tile=64,
            gi_samples=1, gi_depth=1, **kw,
        ),
    )
    return prepare(cfg, scene=scene)


def test_mirror_furnace_exact():
    """A perfect mirror (km=1) under a constant environment returns E
    exactly on every pixel — UNtinted (the reference blend's
    `recurse * km` term carries no base-color factor), regardless of
    the material's albedo."""
    img = np.asarray(render(_mirror_prep(km=1.0)))
    np.testing.assert_allclose(img, E, rtol=1e-5)


def test_reflective_flag_gates_km():
    """km=1 with reflective=False is plain Lambertian (the parallel
    palette's km is meaningless on non-reflective entries)."""
    img = np.asarray(render(_mirror_prep(km=1.0, reflective=False)))
    np.testing.assert_allclose(img, RHO * E, rtol=1e-5)


def test_mirror_mix_pixels_take_exactly_one_branch():
    """At km=0.5 with one sample per pixel, each pixel is EXACTLY the
    mirror value E or the diffuse value rho*E (branch weights
    km/p = (1-km)/(1-p) = 1 at p = sg(km)); the hash draw picks both
    branches across the frame."""
    img = np.asarray(render(_mirror_prep(km=0.5))).reshape(-1, 3)
    is_spec = np.isclose(img[:, 0], E, rtol=1e-5)
    is_diff = np.isclose(img[:, 0], RHO * E, rtol=1e-5)
    assert (is_spec | is_diff).all()
    assert is_spec.any() and is_diff.any()
    # the hash is uniform-ish: neither branch collapses to a sliver
    assert 0.2 < is_spec.mean() < 0.8


def test_km_gradient_pathwise_exact():
    """d radiance / d km: each sampled path's gradient is exactly
    +E/p (mirror branch) or -rho*E/(1-p) (diffuse branch) — the
    score-free pathwise gradient of the branch weights.  The mean
    image gradient must match the value computed from the OBSERVED
    branch assignment (read off the value image), and its expectation
    is d/dkm [km*E + (1-km)*rho*E] = E*(1-rho)."""
    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays

    prep = _mirror_prep(km=0.5)
    # same ray dtype as render(): the sample keys hash the ray BITS, so
    # an x64 default here would flip branch draws vs the value image
    rays = camera_rays(prep.cfg.camera,
                       dtype=jnp.dtype(prep.cfg.render.dtype))

    def loss(km):
        scene = prep.scene._replace(
            materials=prep.scene.materials._replace(km=km)
        )
        out = pathtrace_rays(
            rays, scene, prep.packed.arrays, prep.packed.meta, prep.cfg
        )
        return out.mean()

    km0 = prep.scene.materials.km
    g = float(np.asarray(jax.grad(loss)(km0))[0])

    # branch assignment read off the SAME evaluation the gradient
    # differentiates (render() regenerates rays inside jit, where the
    # f32 ray bits — hence the hash draws — can differ in a few pixels)
    img = np.asarray(
        pathtrace_rays(
            rays, prep.scene, prep.packed.arrays, prep.packed.meta, prep.cfg
        )
    )
    frac_spec = np.isclose(img[:, 0], E, rtol=1e-5).mean()
    # per-pixel gradient: spec -> E/0.5, diff -> -RHO*E/0.5
    want = frac_spec * (E / 0.5) + (1 - frac_spec) * (-RHO * E / 0.5)
    np.testing.assert_allclose(g, want, rtol=1e-4)


def test_sample_batching_is_bitwise_invariant():
    """gi_sample_batch only changes how many samples share a wavefront;
    every (pixel, sample) lane hashes the same key and the per-sample
    images accumulate in the same order, so images are bitwise equal
    for any batch size (including a partial tail batch)."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(12, 12)
    imgs = {}
    for batch in (1, 2, 3, 4):
        c = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render, faithful=False, traversal="packed",
                scheduler="persistent", wave=128, gi_samples=3,
                gi_depth=2, gi_sample_batch=batch,
            ),
        )
        imgs[batch] = np.asarray(render(prepare(c, scene=scene)))
    for batch in (2, 3, 4):
        np.testing.assert_array_equal(imgs[1], imgs[batch])


def test_gi_specular_flag_off_is_bitwise_noop_on_diffuse_scenes():
    """On a km=0 scene the specular machinery is inert: enabling or
    disabling gi_specular yields bitwise-identical images (every branch
    weight is exactly 1.0 and no direction changes)."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(12, 12)
    imgs = {}
    for flag in (True, False):
        c = dataclasses.replace(
            cfg,
            render=dataclasses.replace(
                cfg.render, faithful=False, traversal="packed",
                scheduler="persistent", wave=128, gi_samples=2,
                gi_depth=2, gi_specular=flag,
            ),
        )
        imgs[flag] = np.asarray(render(prepare(c, scene=scene)))
    np.testing.assert_array_equal(imgs[True], imgs[False])


def test_albedo_gradients_flow_through_bounces():
    """d radiance / d base_color through the path integral: on the
    furnace plane radiance = (bc/255) * E exactly, so the autodiff
    gradient of the mean image must equal the analytic E/255 (per
    channel, diagonal)."""
    from ray_tracer_tpu.render.pathtrace import pathtrace_rays
    from ray_tracer_tpu.ops.camera import camera_rays

    prep = _furnace_prep(gi_depth=1, gi_samples=1)
    rays = camera_rays(prep.cfg.camera)

    def loss(bc):
        scene = prep.scene._replace(
            materials=prep.scene.materials._replace(base_color=bc)
        )
        out = pathtrace_rays(
            rays, scene, prep.packed.arrays, prep.packed.meta, prep.cfg
        )
        return out.mean()

    bc0 = prep.scene.materials.base_color
    g = np.asarray(jax.grad(loss)(bc0))
    # d mean / d bc[c] = E / 255 / 3 (each channel is bc[c]/255 * E,
    # mean over 3 channels)
    np.testing.assert_allclose(g, E / 255.0 / 3.0, rtol=1e-4)


def test_env_nee_unbiased_on_furnace():
    """gi_env_nee trades the furnace's zero-variance exactness for MIS
    convergence: with a CONSTANT env the estimator must still average
    to rho * E (unbiasedness), just statistically."""
    img = np.asarray(render(_furnace_prep(
        gi_samples=64, gi_env_nee=True,
    )))
    # image MEAN pins unbiasedness (deterministic sampler: exact
    # reproducible value, measured 49.71 at these samples); per-pixel
    # deviation is MIS variance, bounded loosely
    np.testing.assert_allclose(img.mean(), RHO * E, rtol=0.02)
    np.testing.assert_allclose(img, RHO * E, rtol=0.2)


def test_env_nee_cuts_variance_on_concentrated_env():
    """A single bright texel in an otherwise black env: cosine-sampled
    escapes almost never find it at low sample counts, while env NEE
    samples it directly at every vertex — the 8-sample NEE image must
    be closer to the converged reference than the 8-sample non-NEE
    image (the feature's whole point, VERDICT r3 #8)."""
    env = np.zeros((8, 16, 3), np.float32)
    env[2, 5] = 20000.0  # one bright texel, up-ish

    def _p(**kw):
        prep = _furnace_prep(**kw)
        return prep._replace(scene=prep.scene._replace(
            env_image=jnp.asarray(env)
        ))

    ref = np.asarray(render(_p(gi_samples=96, gi_env_nee=True)))
    nee = np.asarray(render(_p(gi_samples=8, gi_env_nee=True)))
    plain = np.asarray(render(_p(gi_samples=8)))
    err_nee = np.abs(nee - ref).mean()
    err_plain = np.abs(plain - ref).mean()
    assert np.isfinite(nee).all() and np.isfinite(plain).all()
    assert err_nee < err_plain, (err_nee, err_plain)


# ---------------------------------------------------------------------------
# GI x texture parity (round 5): the sampled texture modulates the
# albedo exactly as the Whitted path's base_color
# ---------------------------------------------------------------------------


def _textured_gi_prep(texture, texture_image=None, gi_samples=2,
                      gi_depth=0, **render_kw):
    """uv-mapped quad under a point light (the test_texture scene shape)
    prepared for GI."""
    from ray_tracer_tpu.config import RenderConfig
    from ray_tracer_tpu.io.obj import MeshArrays

    quad = MeshArrays(
        verts=np.array(
            [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
        ),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        uv_faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 120.0, 60.0), kd=2.0, ks=0.0,
                         spec_alpha=4.0, ka=0.3)
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=50.0)
    scene = scene_from_meshes([(quad, 0)], [mat], light)
    if texture_image is not None:
        scene = scene._replace(
            texture_image=jnp.asarray(texture_image, jnp.float32)
        )
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0,
                            width=16, height=16),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, det_dtype="float32",
            max_bounces=0, shadow_eps=1e-3, shadow_scale=0.5, ray_tile=256,
            traversal="packed", fused_shadow=False,
            texture=texture, texture_scale=2.0,
            gi_samples=gi_samples, gi_depth=gi_depth, **render_kw,
        ),
    )
    return prepare(cfg, scene=scene)


def test_gi_constant_texture_scales_albedo_exactly():
    """A CONSTANT image texture c multiplies every GI albedo by exactly
    c (depth 0 = NEE only, radiance linear in albedo): textured image ==
    c * untextured image to float precision."""
    from ray_tracer_tpu.render.pathtrace import render_pt

    c = 0.25
    tex = np.full((4, 4, 3), c, np.float32)
    img_u = np.asarray(render_pt(_textured_gi_prep("none")))
    img_t = np.asarray(render_pt(_textured_gi_prep("image",
                                                   texture_image=tex)))
    np.testing.assert_allclose(img_t, c * img_u, atol=1e-4, rtol=1e-5)


@pytest.mark.parametrize("texture", ["checker", "image"])
def test_gi_texture_factor_matches_whitted(texture):
    """Furnace-style exactness through the shared uv arithmetic: at
    depth 0 the GI radiance is linear in albedo and every Whitted term
    is linear in base_color, so the per-pixel texture factor cancels in
    the cross-ratio — img_gi_tex * img_w_untex == img_gi_untex *
    img_w_tex pixel-for-pixel (checker and bilinear image modes)."""
    from ray_tracer_tpu.render.pathtrace import render_pt

    tex_img = (np.linspace(0.1, 1.0, 4 * 4 * 3, dtype=np.float32)
               .reshape(4, 4, 3) if texture == "image" else None)
    p_t = _textured_gi_prep(texture, texture_image=tex_img)
    p_u = _textured_gi_prep("none", texture_image=tex_img)
    gi_t = np.asarray(render_pt(p_t))
    gi_u = np.asarray(render_pt(p_u))
    # Whitted renders of the same two preps (gi off via render())
    import dataclasses

    def whitted(p):
        cfg = dataclasses.replace(
            p.cfg, render=dataclasses.replace(p.cfg.render, gi_samples=0)
        )
        return np.asarray(render(prepare(cfg, scene=p.scene)))

    w_t, w_u = whitted(p_t), whitted(p_u)
    # the factor varies across the image (both values occur)
    ratio = w_t.sum(-1) / np.maximum(w_u.sum(-1), 1e-9)
    assert ratio.max() - ratio.min() > 0.05, "texture factor is constant?"
    np.testing.assert_allclose(
        gi_t * w_u, gi_u * w_t,
        atol=2e-2 * max(1.0, float(np.abs(gi_u * w_t).max()) ** 0.5),
        rtol=2e-4,
    )


# ---------------------------------------------------------------------------
# Cross-depth GI wave (round 5, ops/gi_wave.py)
# ---------------------------------------------------------------------------


def _wave_pair(prep):
    """(wave image, segment image) for the same prepared scene."""
    import ray_tracer_tpu.render.pathtrace as pt

    w = np.asarray(pt._render_pt_wave(prep))
    cfg_off = dataclasses.replace(
        prep.cfg, render=dataclasses.replace(prep.cfg.render, gi_wave="off")
    )
    s = np.asarray(render(prep._replace(cfg=cfg_off)))
    return w, s


def _plane_gi_prep(S, D, bg=(30.0, 20.0, 10.0), wave=128, pump=2):
    """Lone ground plane, point light above, NO env: every bounce
    escapes upward to the constant background, so radiance is
    direction-independent — the wave and the segment loop must agree to
    float precision regardless of their per-program sampling ulps."""
    plane = mesh_gen.make_plane(extent=8.0, y=-1.0, density=2)
    mats = (MaterialConfig(base_color=(140.0, 90.0, 200.0)),)
    light = LightConfig(position=(0.5, 6.0, 0.3), intensity=60.0)
    scene = scene_from_meshes([(plane, 0)], mats, light)
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 3.0, 0.0),
                            target=(0.1, -1.0, 0.1), width=16, height=16),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=wave,
            pump=pump, ray_tile=64, gi_samples=S, gi_depth=D,
            background=bg, gi_wave="auto",
        ),
    )
    return prepare(cfg, scene=scene)


@pytest.mark.parametrize("S,D,pump", [(1, 1, 1), (3, 2, 2), (4, 0, 4)])
def test_gi_wave_direction_independent_exact(S, D, pump):
    """On the escape-only plane the wave reproduces the segment loop's
    radiance to float precision: shared depth-0 NEE, per-sample escape
    terms and the sample-end cascade all accumulate in the segment
    loop's chronological order."""
    w, s = _wave_pair(_plane_gi_prep(S, D, pump=pump))
    np.testing.assert_allclose(w, s, atol=1e-4, rtol=1e-6)


def test_gi_wave_occlusion_scene_statistical():
    """On a real-occlusion scene (plane + sphere) the wave's draws can
    differ from the segment loop's on silhouette-grazing bounce pixels
    (per-program sampling ulps flip topology there — the documented
    reason gi_wave is opt-in).  The estimates must still agree on the
    vast majority of pixels and in aggregate."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(24, 24)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=256, pump=2,
            gi_samples=2, gi_depth=2, gi_wave="auto",
        ),
    )
    w, s = _wave_pair(prepare(cfg, scene=scene))
    same = (np.abs(w - s) <= 1e-5).all(axis=-1)
    assert same.mean() > 0.97, f"only {same.mean():.3f} of pixels agree"
    np.testing.assert_allclose(w.mean(), s.mean(), rtol=0.02)


def test_gi_wave_eligibility_and_fallback():
    """The eligibility gate: env maps / smooth normals / mirrors fall
    back to the segment loop under 'auto', raise under 'on', and
    default render() never takes the wave (gi_wave defaults 'off')."""
    from ray_tracer_tpu.render.pathtrace import gi_wave_eligible

    prep = _plane_gi_prep(2, 1)
    assert gi_wave_eligible(prep)
    # default config keeps the wave off
    cfg_def = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_wave="off"),
    )
    assert not gi_wave_eligible(prep._replace(cfg=cfg_def))
    # env maps are ELIGIBLE since the deferred-escape extension;
    # env NEE is not: auto falls back, on raises
    prep_env = prep._replace(
        scene=prep.scene._replace(
            env_image=jnp.ones((4, 8, 3), jnp.float32)
        )
    )
    assert gi_wave_eligible(prep_env)
    cfg_nee = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_env_nee=True),
    )
    assert not gi_wave_eligible(prep_env._replace(cfg=cfg_nee))
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_wave="on",
                                   gi_env_nee=True),
    )
    with pytest.raises(ValueError):
        gi_wave_eligible(prep_env._replace(cfg=cfg_on))
    # reflective km > 0 is ELIGIBLE since the mirror-mix extension
    mats = prep.scene.materials._replace(
        reflective=jnp.asarray([True]), km=jnp.asarray([0.5], jnp.float32)
    )
    assert gi_wave_eligible(
        prep._replace(scene=prep.scene._replace(materials=mats))
    )


def test_gi_wave_run_to_run_deterministic():
    """Same program, same inputs -> bitwise identical images."""
    import ray_tracer_tpu.render.pathtrace as pt

    prep = _plane_gi_prep(2, 2)
    a = np.asarray(pt._render_pt_wave(prep))
    b = np.asarray(pt._render_pt_wave(prep))
    np.testing.assert_array_equal(a, b)


def test_gi_wave_grid_entering_miss_gets_background():
    """Round-5 review regression: a primary ray that ENTERS the grid
    AABB but misses all geometry must latch S x background, not 0 (the
    flush used to scatter rad=0 over the correctly-initialized output
    row).  Two coplanar quads with an empty corridor between them: the
    corridor pixels' slab test passes but no triangle is hit."""
    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes

    def quad(x0, x1, y):
        return np.array(
            [[x0, y, -2], [x1, y, -2], [x1, y, 2], [x0, y, 2]], np.float32
        )

    # different heights give the grid AABB thickness (a zero-thickness
    # slab would put every bounce origin exactly on the boundary plane
    # — the march's boundary-creep pathology, where step-budget
    # differences between integrators are expected)
    verts = np.concatenate([quad(-2.0, -0.8, 0.0), quad(0.8, 2.0, 0.6)])
    faces = np.array(
        [[0, 1, 2], [0, 2, 3], [4, 5, 6], [4, 6, 7]], np.int32
    )
    mesh = MeshArrays(verts=verts, faces=faces,
                      uvs=np.zeros((0, 2), np.float32),
                      uv_faces=np.zeros((0, 3), np.int32))
    mat = MaterialConfig(base_color=(200.0, 120.0, 60.0))
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=40.0)
    scene = scene_from_meshes([(mesh, 0)], [mat], light)
    bg = (30.0, 20.0, 10.0)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0,
                            width=16, height=16),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=128, pump=2,
            ray_tile=64, gi_samples=2, gi_depth=1, background=bg,
            gi_wave="auto",
        ),
    )
    prep = prepare(cfg, scene=scene)
    w, s = _wave_pair(prep)
    # the corridor pixels are grid-entering misses: both integrators
    # must report the background there, and agree everywhere
    corridor = np.abs(s - np.asarray(bg)).sum(-1) < 1e-4
    assert corridor.any(), "scene should have grid-entering miss pixels"
    np.testing.assert_allclose(w, s, atol=1e-4, rtol=1e-6)


def test_gi_wave_env_furnace_exact():
    """Env maps through the wave (deferred-escape resolution): on the
    CONSTANT-environment furnace every escape sees the same radiance,
    so the wave must match the segment loop to float precision AND the
    analytic furnace value."""
    prep = _furnace_prep(gi_depth=1, gi_samples=3)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_wave="on"),
    )
    import ray_tracer_tpu.render.pathtrace as pt

    assert pt.gi_wave_eligible(prep._replace(cfg=cfg_on))
    w, s = _wave_pair(prep._replace(cfg=cfg_on))
    np.testing.assert_allclose(w, s, atol=1e-3, rtol=1e-6)
    # plane pixels read exactly rho * E (the zero-variance furnace)
    hit = np.abs(s - E).sum(-1) > 1e-3
    np.testing.assert_allclose(w[hit], RHO * E, atol=1e-3)


def test_gi_wave_env_nonuniform_statistical():
    """A NON-constant env makes escapes direction-dependent: the wave
    and the segment loop draw per-program ulp-different directions, so
    agreement is statistical (same caveat as the occlusion test)."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(24, 24)
    env = jnp.asarray(
        np.linspace(5.0, 90.0, 4 * 8 * 3, dtype=np.float32).reshape(4, 8, 3)
    )
    scene = scene._replace(env_image=env)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=256, pump=2,
            gi_samples=2, gi_depth=2, gi_wave="auto",
        ),
    )
    w, s = _wave_pair(prepare(cfg, scene=scene))
    # with a non-constant env EVERY escape direction matters, so any
    # lane whose sampled direction bits differ across the two programs
    # reads a different env value — ~94% of pixels match exactly here
    # (vs ~99% with a flat background, where only hit/miss flips show)
    same = (np.abs(w - s) <= 1e-3).all(axis=-1)
    assert same.mean() > 0.9, f"only {same.mean():.3f} of pixels agree"
    np.testing.assert_allclose(w.mean(), s.mean(), rtol=0.02)


def test_gi_wave_smooth_normals():
    """Smooth normals through the wave (one packed corner-normal row):
    on the flat plane every corner normal is the face normal, so smooth
    must equal the face-mode image to float precision; on the curved
    plane+spheres scene it must match the segment loop statistically
    (draw-for-draw where direction bits agree)."""
    import ray_tracer_tpu.render.pathtrace as pt

    prep = _plane_gi_prep(2, 1)
    cfg_sm = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, normal_mode="smooth"),
    )
    prep_sm = prep._replace(cfg=cfg_sm)
    assert pt.gi_wave_eligible(prep_sm)
    w_sm, s_sm = _wave_pair(prep_sm)
    np.testing.assert_allclose(w_sm, s_sm, atol=1e-4, rtol=1e-6)
    w_face = np.asarray(pt._render_pt_wave(prep))
    np.testing.assert_allclose(w_sm, w_face, atol=1e-4, rtol=1e-5)

    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(24, 24)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=256, pump=2,
            gi_samples=2, gi_depth=1, gi_wave="auto",
            normal_mode="smooth",
        ),
    )
    w, s = _wave_pair(prepare(cfg, scene=scene))
    same = (np.abs(w - s) <= 1e-4).all(axis=-1)
    assert same.mean() > 0.95, f"only {same.mean():.3f} of pixels agree"
    np.testing.assert_allclose(w.mean(), s.mean(), rtol=0.02)


def test_gi_wave_mirror_furnace():
    """The Lambertian/mirror mix through the wave.  km == 1 makes every
    draw take the mirror branch (u3 < 1 always), so the estimate is
    draw-independent: the wave must equal the segment loop AND the
    analytic furnace value (mirror radiance is untinted E) to float
    precision.  km in (0,1) leaves the BRANCH riding each pixel's
    ray-bit key — per-program key ulps flip the draw on a few pixels
    (~4/256 here), so that case is statistical like every other
    draw-sensitive comparison."""
    import ray_tracer_tpu.render.pathtrace as pt

    prep = _mirror_prep(km=1.0)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_wave="on",
                                   gi_samples=3, gi_depth=2),
    )
    assert pt.gi_wave_eligible(prep._replace(cfg=cfg_on))
    w, s = _wave_pair(prep._replace(cfg=cfg_on))
    np.testing.assert_allclose(w, s, atol=1e-3, rtol=1e-6)
    hit = np.abs(s - E).sum(-1) > 1e-3
    np.testing.assert_allclose(w[hit], E, atol=2e-3)

    prep7 = _mirror_prep(km=0.7)
    cfg7 = dataclasses.replace(
        prep7.cfg,
        render=dataclasses.replace(prep7.cfg.render, gi_wave="on",
                                   gi_samples=3, gi_depth=2),
    )
    w7, s7 = _wave_pair(prep7._replace(cfg=cfg7))
    same = (np.abs(w7 - s7) <= 1e-3).all(axis=-1)
    assert same.mean() > 0.95, f"only {same.mean():.3f} of pixels agree"


def test_gi_wave_mirror_occlusion_statistical():
    """Mirror mix + real occlusion (plane + reflective sphere): the
    usual statistical contract."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene

    scene, cfg = gradcheck_scene(24, 24)
    mats = scene.materials._replace(
        reflective=jnp.asarray([False, True]),
        km=jnp.asarray([0.0, 0.6], jnp.float32),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=256, pump=2,
            gi_samples=2, gi_depth=2, gi_wave="auto",
        ),
    )
    w, s = _wave_pair(prepare(cfg, scene=scene._replace(materials=mats)))
    same = (np.abs(w - s) <= 1e-3).all(axis=-1)
    assert same.mean() > 0.9, f"only {same.mean():.3f} of pixels agree"
    # the scene is VERY dark (mean ~1e-3) and the branch draw is
    # value-relevant, so the few draw-flipped pixels swing the tiny
    # mean — aggregate agreement is correspondingly loose here
    np.testing.assert_allclose(w.mean(), s.mean(), rtol=0.15)


def test_gi_wave_mirror_furnace_shadow_marched():
    """Round-5 review regression (stale km0): under parallel shading
    the depth-0 NEE shadow points TOWARD the light and, with a grid
    AABB tall enough, actually MARCHES — the depth-0 vertex data
    (km included) must survive that march for the restart samples'
    branch draws.  km=1 keeps the estimate draw-independent: every
    sample mirrors and escapes to the constant env, so hit pixels read
    exactly E through wave AND segments."""
    import ray_tracer_tpu.render.pathtrace as pt
    from ray_tracer_tpu.io.obj import MeshArrays

    plane = mesh_gen.make_plane(extent=8.0, y=-1.0, density=2)
    # one distant high triangle stretches the grid AABB upward so the
    # shadow/bounce rays march instead of exiting at the slab
    spike = MeshArrays(
        verts=np.array([[7.5, 4.0, 7.5], [7.9, 4.0, 7.5],
                        [7.7, 4.2, 7.9]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((0, 2), np.float32),
        uv_faces=np.zeros((0, 3), np.int32),
    )
    mats = (MaterialConfig(base_color=(255.0 * RHO,) * 3, km=1.0,
                           reflective=True),)
    light = LightConfig(position=(0.0, 5.0, 0.0), intensity=0.0)
    scene = scene_from_meshes([(plane, 0), (spike, 0)], mats, light)
    scene = scene._replace(
        env_image=jnp.broadcast_to(
            jnp.asarray([E, E, E], jnp.float32), (4, 8, 3)
        )
    )
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 3.0, 0.0),
                            target=(0.1, -1.0, 0.1), width=16, height=16),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, shading="parallel", faithful=False,
            det_dtype="float32", traversal="packed",
            scheduler="persistent", wave=128, pump=2, ray_tile=64,
            shadow_eps=1e-3, gi_samples=3, gi_depth=1, gi_wave="on",
        ),
    )
    prep = prepare(cfg, scene=scene)
    assert pt.gi_wave_eligible(prep)
    w, s = _wave_pair(prep)
    np.testing.assert_allclose(w, s, atol=2e-3, rtol=1e-6)
    # every pixel reads E: hits mirror-escape to the constant env, and
    # misses read the env directly (with the stale-km0 bug, restart
    # samples drew the diffuse branch instead -> 0.667*E on the plane)
    np.testing.assert_allclose(w, E, atol=2e-2)


@pytest.mark.parametrize("texture", ["checker", "image"])
def test_gi_wave_texture_depth0_exact(texture):
    """Textures through the wave (one (F,7) corner-uv row): at depth 0
    the estimate has NO sampled directions at all (NEE only), so the
    wave must match the textured segment integrator to float precision
    — checker and bilinear image modes."""
    import ray_tracer_tpu.render.pathtrace as pt

    tex_img = (np.linspace(0.1, 1.0, 4 * 4 * 3, dtype=np.float32)
               .reshape(4, 4, 3) if texture == "image" else None)
    prep = _textured_gi_prep(texture, texture_image=tex_img,
                             gi_samples=2, gi_depth=0)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(
            prep.cfg.render, gi_wave="on", scheduler="persistent",
            wave=128, pump=2,
        ),
    )
    prep = prep._replace(cfg=cfg_on)
    assert pt.gi_wave_eligible(prep)
    w, s = _wave_pair(prep)
    np.testing.assert_allclose(w, s, atol=1e-5, rtol=1e-6)


def test_gi_wave_texture_bounce_statistical():
    """Depth >= 1 adds sampled bounce directions: statistical contract."""
    prep = _textured_gi_prep("checker", gi_samples=2, gi_depth=1)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(
            prep.cfg.render, gi_wave="auto", scheduler="persistent",
            wave=128, pump=2, background=(12.0, 8.0, 4.0),
        ),
    )
    w, s = _wave_pair(prep._replace(cfg=cfg_on))
    same = (np.abs(w - s) <= 1e-4).all(axis=-1)
    assert same.mean() > 0.95, f"only {same.mean():.3f} of pixels agree"
    np.testing.assert_allclose(w.mean(), s.mean(), rtol=0.02)


@pytest.mark.parametrize("balance", [True, False])
def test_gi_wave_sharded_equals_single(eight_device_mesh, balance):
    """The sharded GI wave (round 5 cont.): render_sharded routes
    eligible GI configs through one wave per shard, each regenerating
    its pixels by (offset, stride) queue arithmetic — identical to the
    single-device wave on the direction-independent plane scene."""
    from ray_tracer_tpu.parallel.shard import render_sharded
    import ray_tracer_tpu.render.pathtrace as pt

    prep = _plane_gi_prep(2, 2)
    single = np.asarray(pt._render_pt_wave(prep))
    sharded = np.asarray(
        render_sharded(prep, mesh=eight_device_mesh, balance=balance)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-5)


def test_gi_wave_sharded_mirror_env(eight_device_mesh):
    """Sharded GI wave with the mirror mix AND an env map: the km=1
    furnace is draw-independent, so sharded == single == analytic E."""
    from ray_tracer_tpu.parallel.shard import render_sharded
    import ray_tracer_tpu.render.pathtrace as pt

    prep = _mirror_prep(km=1.0)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, gi_wave="on",
                                   gi_samples=2, gi_depth=1),
    )
    p = prep._replace(cfg=cfg_on)
    single = np.asarray(pt._render_pt_wave(p))
    sharded = np.asarray(render_sharded(p, mesh=eight_device_mesh))
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-4)


def test_gi_wave_all_features_combined():
    """Every wave feature at once — smooth normals + checker texture +
    env map + mirror mix + sharding: pairwise parity is tested above;
    this pins the COMBINED static gating (each feature is a separate
    carry/gather that must compose).  Flat-quad depth-0 is
    direction-free, so wave == segments to float precision even with
    all features armed; the sharded wave must equal the single wave."""
    import ray_tracer_tpu.render.pathtrace as pt
    from ray_tracer_tpu.parallel.shard import render_sharded

    prep0 = _textured_gi_prep("checker", gi_samples=2, gi_depth=0)
    scene = prep0.scene._replace(
        env_image=jnp.broadcast_to(
            jnp.asarray([40.0, 30.0, 20.0], jnp.float32), (4, 8, 3)
        ),
        materials=prep0.scene.materials._replace(
            reflective=jnp.asarray([True]),
            km=jnp.asarray([0.3], jnp.float32),
        ),
    )
    cfg = dataclasses.replace(
        prep0.cfg,
        render=dataclasses.replace(
            prep0.cfg.render, gi_wave="on", scheduler="persistent",
            wave=128, pump=2, normal_mode="smooth",
        ),
    )
    prep = prepare(cfg, scene=scene)
    assert pt.gi_wave_eligible(prep)
    w, s = _wave_pair(prep)
    # depth 0: NEE is branch-gated (spec vertices skip it) and the
    # branch draw is key-exact, so even the mirror mix stays exact here
    np.testing.assert_allclose(w, s, atol=1e-4, rtol=1e-6)
