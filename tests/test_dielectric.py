"""Dielectric (glass) materials in the path-traced GI integrator.

No reference counterpart: the reference's materials are Blinn-Phong +
mirror only (Parallel/raytracer.cu:449-453); refraction is a capability
extension of the new framework.  The physics under test
(render/pathtrace.fresnel_refract + the integrator's stochastic
reflect/refract selection):

  * exact Fresnel equations (NOT Schlick), so ior == 1 gives F == 0 at
    every angle — a slab of ior-1 glass is EXACTLY invisible;
  * total internal reflection falls out of the equations (cos_t
    clamps to 0 -> F == 1), no special case;
  * each branch's throughput weight divides by the stop-gradient
    selection probability, so escaped paths carry weight exactly 1 and
    a glass object in a constant-radiance furnace returns the furnace
    radiance;
  * d radiance / d ior flows through the Fresnel weights (Scene.ior is
    a differentiable leaf) — FD-checked at normal incidence, where the
    reflected/refracted DIRECTIONS are ior-independent and the
    stop-gradient-direction estimator is exact.
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
from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.models.scenes import scene_from_numpy
from ray_tracer_tpu.render.pathtrace import fresnel_refract, pathtrace_rays
from ray_tracer_tpu.render.renderer import prepare, render


# ---------------------------------------------------------------------------
# fresnel_refract unit tests (pure math, no scene)
# ---------------------------------------------------------------------------


def _lanes(cos_i, entering, ior):
    """Build (R,3) d/n pairs with the requested incidence cosines:
    n = +z oriented against d."""
    cos_i = np.asarray(cos_i, np.float32)
    sin_i = np.sqrt(np.maximum(1.0 - cos_i**2, 0.0))
    d = np.stack([sin_i, np.zeros_like(cos_i), -cos_i], axis=-1)
    n = np.broadcast_to(np.array([0.0, 0.0, 1.0], np.float32), d.shape)
    r = len(cos_i)
    return (jnp.asarray(d), jnp.asarray(n),
            jnp.broadcast_to(jnp.asarray(entering), (r,)),
            jnp.broadcast_to(jnp.asarray(ior, jnp.float32), (r,)))


def test_fresnel_normal_incidence_exact():
    """F(cos_i = 1) == ((n-1)/(n+1))^2 exactly, entering AND exiting."""
    for ior in (1.33, 1.5, 2.4):
        for entering in (True, False):
            d, n, e, i = _lanes([1.0], entering, ior)
            F, _, refr = fresnel_refract(d, n, e, i)
            want = ((ior - 1.0) / (ior + 1.0)) ** 2
            np.testing.assert_allclose(np.asarray(F), [want], rtol=1e-6)
            # at normal incidence the refracted direction is d for ANY
            # ior (the property the gradient test leans on)
            np.testing.assert_allclose(
                np.asarray(refr), np.asarray(d), atol=1e-6
            )


def test_fresnel_ior_one_is_zero_everywhere():
    """Exact Fresnel (unlike Schlick): ior == 1 reflects NOTHING at any
    angle, and the refracted direction is the incident direction."""
    cos = np.linspace(0.05, 1.0, 16)
    for entering in (True, False):
        d, n, e, i = _lanes(cos, entering, 1.0)
        F, _, refr = fresnel_refract(d, n, e, i)
        np.testing.assert_allclose(np.asarray(F), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(refr), np.asarray(d),
                                   atol=1e-6)


def test_fresnel_total_internal_reflection():
    """Exiting beyond the critical angle: F == 1 exactly (no explicit
    TIR branch — the clamped equations produce it); below: F < 1."""
    ior = 1.5
    crit = np.arcsin(1.0 / ior)  # ~41.8 deg
    cos_tir = np.cos(crit + 0.1)  # beyond critical (shallower)
    cos_ok = np.cos(crit - 0.1)
    d, n, e, i = _lanes([cos_tir, cos_ok], False, ior)
    F, _, _ = fresnel_refract(d, n, e, i)
    F = np.asarray(F)
    np.testing.assert_allclose(F[0], 1.0, rtol=1e-6)
    assert F[1] < 0.999


def test_snell_direction():
    """Refracted directions are unit, in the incidence plane, and obey
    sin_t == eta sin_i on both sides of the interface."""
    cos = np.linspace(0.3, 0.95, 8)
    for entering, ior in ((True, 1.5), (False, 1.2)):
        d, n, e, i = _lanes(cos, entering, ior)
        F, _, refr = fresnel_refract(d, n, e, i)
        refr = np.asarray(refr)
        eta = (1.0 / ior) if entering else ior
        sin_i = np.sqrt(1.0 - cos**2)
        ok = eta * sin_i < 1.0  # refraction exists (refr_dir is
        assert ok.any()         # documented meaningless under TIR)
        np.testing.assert_allclose(
            np.linalg.norm(refr[ok], axis=-1), 1.0, rtol=1e-5
        )
        assert np.abs(refr[ok, 1]).max() < 1e-6  # incidence plane y=0
        np.testing.assert_allclose(
            np.abs(refr[ok, 0]), eta * sin_i[ok], atol=1e-5
        )
        assert (refr[ok, 2] < 0).all()  # continues into the surface


# ---------------------------------------------------------------------------
# Integrator tests on a glass slab
# ---------------------------------------------------------------------------

E = 100.0  # furnace radiance (0-255 units)


def _quad(y, up, half=1.0):
    v = np.array([[-half, y, -half], [-half, y, half],
                  [half, y, -half], [half, y, half]], np.float32)
    if up:  # outward normal +y
        f = np.array([[0, 1, 2], [2, 1, 3]], np.int32)
    else:  # outward normal -y
        f = np.array([[0, 2, 1], [1, 2, 3]], np.int32)
    return v, f


def _slab_prep(ior=1.5, gi_depth=6, gi_samples=4, intensity=0.0,
               width=8, height=8, **render_kw):
    """A floating glass slab (top face y=0 outward +y, bottom y=-0.5
    outward -y), nothing else in the scene."""
    vt, ft = _quad(0.0, True)
    vb, fb = _quad(-0.5, False)
    verts = np.concatenate([vt, vb])
    faces = np.concatenate([ft, fb + 4])
    fmat = np.zeros((4,), np.int32)
    mats = (MaterialConfig(base_color=(255.0, 255.0, 255.0),
                           transmissive=True, ior=ior),)
    light = LightConfig(position=(0.0, 5.0, 0.0), intensity=intensity)
    scene = scene_from_numpy(verts, faces, fmat, mats, light)
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 2.0, 0.0),
                            target=(0.05, 0.0, 0.05),
                            width=width, height=height),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=128, ray_tile=64,
            gi_samples=gi_samples, gi_depth=gi_depth, **render_kw,
        ),
    )
    return prepare(cfg, scene=scene)


def _straight_down_rays(prep, n=6, y0=2.0):
    """(n*n,) rays at exact normal incidence onto the slab, avoiding
    the quad diagonals."""
    xs = np.linspace(-0.8, 0.77, n, dtype=np.float32) + 0.013
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    orig = np.stack(
        [gx, np.full_like(gx, y0), gz], axis=-1
    ).reshape(-1, 3)
    dirn = np.broadcast_to(
        np.array([0.0, -1.0, 0.0], np.float32), orig.shape
    )
    eps = prep.cfg.render.shadow_eps
    return RayBatch.make(jnp.asarray(orig), jnp.asarray(dirn),
                         mint=jnp.asarray(eps, jnp.float32))


def test_ior_one_slab_exactly_invisible():
    """ior == 1 glass: F == 0 everywhere, straight-through refraction,
    unit weights — every path exits the slab and picks up the constant
    background EXACTLY (both interfaces traversed inside the depth
    budget)."""
    prep = _slab_prep(ior=1.0, gi_depth=3, gi_samples=2)
    rays = _straight_down_rays(prep)
    rad = np.asarray(pathtrace_rays(
        rays, prep.scene, prep.packed.arrays, prep.packed.meta, prep.cfg
    ))
    want = np.broadcast_to(
        np.asarray(prep.cfg.render.background, np.float32), rad.shape
    )
    np.testing.assert_array_equal(rad, want)


def test_furnace_with_glass_slab():
    """A glass slab in a constant-radiance furnace returns the furnace
    radiance: every escaped path's throughput is exactly 1 (each
    branch's weight is F/sg(F) or (1-F)/sg(1-F) == 1.0 in floats), and
    with depth 8 the un-escaped mass is < F^7 ~ 1e-10."""
    prep = _slab_prep(ior=1.5, gi_depth=8, gi_samples=4)
    prep = prep._replace(scene=prep.scene._replace(
        env_image=jnp.broadcast_to(
            jnp.asarray([E, E, E], jnp.float32), (4, 8, 3)
        )
    ))
    img = np.asarray(render(prep))
    np.testing.assert_allclose(img, E, rtol=1e-4)


def test_ior_gradient_matches_analytic():
    """d radiance / d ior through the stochastic Fresnel selection.

    Central differences are NOT the oracle here: the selection
    probability p = sg(F(ior)) tracks F in every (perturbed) forward
    evaluation, so each branch's weight is exactly 1 at every ior and
    the realized FD is 0 between selection flips — the estimator is
    unbiased in EXPECTATION over the draw, not pointwise smooth (the
    same property as the km mirror mix).  What autodiff must return is
    the per-lane score term: a lane that reflected contributes
    L_refl * F'/F, a refracted one -L_refr * F'/(1-F) — whose
    expectation is F'(L_refl - L_refr), the true gradient.  A single
    glass SHEET at normal incidence makes that closed-form: reflected
    lanes see env A (up), refracted ones env B (down), F and
    F' = dF/d ior are the normal-incidence constants."""
    A, B = 160.0, 40.0
    # one interface: just the top quad
    vt, ft = _quad(0.0, True)
    mats = (MaterialConfig(transmissive=True, ior=1.5),)
    light = LightConfig(position=(0.0, 5.0, 0.0), intensity=0.0)
    scene = scene_from_numpy(vt, ft, np.zeros((2,), np.int32), mats, light)
    env = np.empty((4, 8, 3), np.float32)
    env[:2] = A
    env[2:] = B
    scene = scene._replace(env_image=jnp.asarray(env))
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 2.0, 0.0),
                            target=(0.05, 0.0, 0.05), width=8, height=8),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=128, ray_tile=64,
            gi_samples=1, gi_depth=1,
        ),
    )
    prep = prepare(cfg, scene=scene)
    rays = _straight_down_rays(prep)
    garr, gmeta = prep.packed.arrays, prep.packed.meta

    def f(ior):
        sc = prep.scene._replace(ior=jnp.full_like(prep.scene.ior, ior))
        return jnp.mean(pathtrace_rays(rays, sc, garr, gmeta, prep.cfg))

    rad = np.asarray(pathtrace_rays(
        rays, prep.scene, garr, gmeta, prep.cfg
    ))
    reflected = rad[:, 0] > 0.5 * (A + B)
    assert reflected.any() and (~reflected).any()  # both branches drawn
    ior = 1.5
    F = ((ior - 1.0) / (ior + 1.0)) ** 2
    Fp = 2.0 * ((ior - 1.0) / (ior + 1.0)) * (2.0 / (ior + 1.0) ** 2)
    want = np.where(reflected, A * Fp / F, -B * Fp / (1.0 - F)).mean()
    g_ad = float(jax.grad(f)(jnp.float32(ior)))
    np.testing.assert_allclose(g_ad, want, rtol=1e-4)


def test_ior_one_and_half_mixes_both_branches():
    """At ior 1.5 the deterministic draws take BOTH branches somewhere
    in the sample set (F ~ 0.04 at normal incidence): the image must
    contain radiance from the up-env AND the down-env."""
    A, B = 160.0, 40.0
    prep = _slab_prep(ior=1.5, gi_depth=6, gi_samples=16)
    env = np.empty((4, 8, 3), np.float32)
    env[:2] = A
    env[2:] = B
    scene = prep.scene._replace(env_image=jnp.asarray(env))
    rays = _straight_down_rays(prep)
    rad = np.asarray(pathtrace_rays(
        rays, scene, prep.packed.arrays, prep.packed.meta, prep.cfg
    ))
    mean = rad.mean()
    assert B < mean < A
    assert mean < B + 0.25 * (A - B)  # mostly transmitted (F ~ 0.04)
    assert (np.abs(rad - B) > 1e-3).any()  # some reflection happened


def test_whitted_paths_reject_transmissive():
    """The Whitted renderer, fit() and the sharded Whitted render raise
    on transmissive scenes instead of silently dropping the glass."""
    prep = _slab_prep(gi_samples=0)
    with pytest.raises(NotImplementedError, match="path-traced"):
        render(prep)

    from ray_tracer_tpu.opt.fit import fit

    with pytest.raises(NotImplementedError, match="refraction"):
        fit(prep, jnp.zeros((8, 8, 3)), steps=1)


def test_gi_wave_ineligible_for_glass():
    """Dielectric scenes fall back to the segment-loop integrator; the
    wave refuses explicitly when forced."""
    from ray_tracer_tpu.render.pathtrace import gi_wave_eligible

    prep = _slab_prep(gi_samples=2, gi_depth=2, gi_wave="auto")
    assert not gi_wave_eligible(prep)
    prep_on = _slab_prep(gi_samples=2, gi_depth=2, gi_wave="on")
    with pytest.raises(ValueError, match="ineligible"):
        gi_wave_eligible(prep_on)


def test_glass_sharded_equals_single(eight_device_mesh):
    """Replicated ray-sharding with glass: the Scene's transmissive/ior
    leaves ride the replicated scene pytree into each shard's
    pathtrace_rays, and the ray-bit sample keys make the Fresnel draws
    shard-invariant — sharded == single-device BITWISE (the same
    contract as every other GI feature)."""
    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.parallel.shard import render_sharded

    scene, cfg = gradcheck_scene(12, 12)
    m = scene.materials.base_color.shape[0]
    trans = np.zeros((m,), bool)
    trans[-1] = True
    scene = scene._replace(
        transmissive=jnp.asarray(trans),
        ior=jnp.full((m,), 1.5, jnp.float32),
    )
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


def test_point_light_shines_through_ior_one_slab():
    """NEE is skipped at glass vertices (a delta interface cannot be
    connected to a point light), but a Lambertian floor BELOW ior-1
    glass still receives bounce light through the slab: the transmitted
    path continues to the lit floor and carries its radiance back."""
    # floor at y=-2 (Lambertian, albedo 0.5), glass slab above it
    vt, ft = _quad(0.0, True)
    vb, fb = _quad(-0.5, False)
    vf, ff = _quad(-2.0, True, half=4.0)
    verts = np.concatenate([vt, vb, vf])
    faces = np.concatenate([ft, fb + 4, ff + 8])
    fmat = np.array([0, 0, 0, 0, 1, 1], np.int32)
    mats = (
        MaterialConfig(transmissive=True, ior=1.0),
        MaterialConfig(base_color=(127.5, 127.5, 127.5)),
    )
    light = LightConfig(position=(0.0, -1.0, 0.0), intensity=200.0)
    scene = scene_from_numpy(verts, faces, fmat, mats, light)
    cfg = SceneConfig(
        materials=mats, light=light,
        camera=CameraConfig(position=(0.0, 2.0, 0.0),
                            target=(0.05, 0.0, 0.05), width=8, height=8),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, traversal="packed",
            scheduler="persistent", wave=128, ray_tile=64,
            gi_samples=2, gi_depth=3,
            background=(0.0, 0.0, 0.0),  # isolate the NEE term
        ),
    )
    prep = prepare(cfg, scene=scene)
    rays = _straight_down_rays(prep)
    rad = np.asarray(pathtrace_rays(
        rays, prep.scene, prep.packed.arrays, prep.packed.meta, prep.cfg
    ))
    # the light sits between slab and floor: the floor point under each
    # ray is lit, and the ior-1 slab transmits with weight exactly 1,
    # so with a black background radiance == rho/pi * I * cos / r^2 at
    # the transmitted path's floor hit, analytically per ray
    xs = np.linspace(-0.8, 0.77, 6, dtype=np.float32) + 0.013
    gx, gz = np.meshgrid(xs, xs, indexing="ij")
    px = np.stack([gx, np.full_like(gx, -2.0), gz], -1).reshape(-1, 3)
    to_l = np.array([0.0, -1.0, 0.0]) - px
    r2 = (to_l**2).sum(-1)
    cos = np.maximum(to_l[:, 1] / np.sqrt(r2), 0.0)
    want = (0.5 / np.pi * 200.0 * cos / r2)[:, None] * np.ones(3)
    np.testing.assert_allclose(rad, want, rtol=1e-4, atol=1e-4)
