"""Checkerboard texture sampling on the carried vt data (the reference
parses uvs per triangle but never samples them,
Serial/raytracer.cpp:252-283 — this completes that plumbing)."""

import dataclasses

import numpy as np

from ray_tracer_tpu.config import (
    CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
)
from ray_tracer_tpu.io.obj import MeshArrays
from ray_tracer_tpu.models.scenes import scene_from_meshes
from ray_tracer_tpu.render.renderer import prepare, render


def _quad_prep(texture: str, base_scale: float = 1.0, texture_image=None,
               texture_scale: float = 2.0):
    quad = MeshArrays(
        verts=np.array(
            [[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32
        ),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32),
        uv_faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
    )
    mat = MaterialConfig(
        base_color=(200.0 * base_scale, 120.0 * base_scale, 60.0 * base_scale),
        kd=2.0, ks=0.0, spec_alpha=4.0, ka=0.3,
    )
    light = LightConfig(position=(0.0, 8.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(quad, 0)], [mat], light)
    if texture_image is not None:
        import jax.numpy as jnp

        scene = scene._replace(
            texture_image=jnp.asarray(texture_image, jnp.float32)
        )
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0, width=32, height=32),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, max_bounces=0,
            shadow_eps=1e-3, shadow_scale=0.5, ray_tile=256,
            texture=texture, texture_scale=texture_scale,
        ),
    )
    return prepare(cfg, scene=scene)


def test_checker_golden_against_halved_base():
    """Every textured pixel equals the SAME pixel of either the plain
    render or the half-base-color render — the checker can only scale
    base_color by 1 or 0.5 — and both cell kinds appear."""
    tex = np.asarray(render(_quad_prep("checker")))
    plain = np.asarray(render(_quad_prep("none")))
    half = np.asarray(render(_quad_prep("none", base_scale=0.5)))

    is_plain = np.isclose(tex, plain, atol=1e-4).all(axis=-1)
    is_half = np.isclose(tex, half, atol=1e-4).all(axis=-1)
    assert (is_plain | is_half).all()
    hit = (plain != 0).any(axis=-1)
    assert (is_plain & hit).sum() > 50
    assert (is_half & hit).sum() > 50
    # 2x2 checker across the unit uv square: the four image quadrants
    # alternate, so the pattern is anti-symmetric under a horizontal flip
    assert (is_half & hit).sum() + (is_plain & hit).sum() == hit.sum()


def test_texture_checker_differs_only_on_surface():
    """The checker must change SOME surface pixels and NO background
    pixels (miss lanes carry no uv sample)."""
    a = np.asarray(render(_quad_prep("none")))
    b = np.asarray(render(_quad_prep("checker")))
    diff = np.abs(a - b).max(axis=-1)
    assert (diff > 1e-6).any(), "checker texture changed nothing"
    bg = (a == 0.0).all(axis=-1)  # background is black in this scene
    assert (diff[bg] == 0.0).all(), "texture leaked into background pixels"


def test_image_texture_constant_equals_scaled_base():
    """A constant 0.5 texture must reproduce the half-base-color render
    exactly (bilinear interpolation of a constant grid is that constant)."""
    tex = np.full((4, 4, 3), 0.5, np.float32)
    img = np.asarray(render(_quad_prep("image", texture_image=tex,
                                       texture_scale=1.0)))
    half = np.asarray(render(_quad_prep("none", base_scale=0.5)))
    np.testing.assert_allclose(img, half, atol=1e-3)


def test_sample_texture_orientation():
    """Pin the uv convention: texel centers at ((i+0.5)/W, v from the
    image BOTTOM), wrap tiling, bilinear midpoints exactly halfway."""
    import jax.numpy as jnp

    tex = np.zeros((2, 2, 3), np.float32)
    tex[0, 0] = (1, 0, 0)  # image TOP-left    = uv (0.25, 0.75)
    tex[0, 1] = (0, 1, 0)  # image TOP-right   = uv (0.75, 0.75)
    tex[1, 0] = (0, 0, 1)  # image BOTTOM-left = uv (0.25, 0.25)
    tex[1, 1] = (1, 1, 0)  # image BOTTOM-right= uv (0.75, 0.25)
    scene = _quad_prep("image", texture_image=tex).scene
    uv = jnp.asarray(
        [[0.25, 0.75], [0.75, 0.75], [0.25, 0.25], [0.75, 0.25],
         [0.5, 0.25],   # u midpoint of the two bottom texels
         [1.25, 0.75]],  # wraps to u=0.25 of the top row
        jnp.float32,
    )
    got = np.asarray(scene.sample_texture(uv))
    np.testing.assert_allclose(got[0], tex[0, 0], atol=1e-6)
    np.testing.assert_allclose(got[1], tex[0, 1], atol=1e-6)
    np.testing.assert_allclose(got[2], tex[1, 0], atol=1e-6)
    np.testing.assert_allclose(got[3], tex[1, 1], atol=1e-6)
    np.testing.assert_allclose(got[4], (tex[1, 0] + tex[1, 1]) / 2, atol=1e-6)
    np.testing.assert_allclose(got[5], tex[0, 0], atol=1e-6)


def test_image_texture_renders_gradient_on_surface_only():
    """A 1x2 black/white texture (scale 1, wrap): the render shows both
    strongly-darkened and near-plain surface pixels plus a bilinear
    blend band, and never brightens or touches the background."""
    tex = np.zeros((1, 2, 3), np.float32)
    tex[0, 1] = 1.0
    img = np.asarray(render(_quad_prep("image", texture_image=tex,
                                       texture_scale=1.0)))
    plain = np.asarray(render(_quad_prep("none")))
    hit = (plain != 0).any(axis=-1)
    assert (img <= plain + 1e-3).all(), "texture must only darken"
    bg = ~hit
    assert (np.abs(img - plain)[bg] == 0.0).all(), "background changed"
    ratio = np.where(plain > 0, img / np.maximum(plain, 1e-9), 1.0).min(axis=-1)
    assert ((ratio < 0.2) & hit).sum() > 30, "no dark texel region"
    assert ((ratio > 0.9) & hit).sum() > 30, "no bright texel region"
    assert ((ratio > 0.35) & (ratio < 0.65) & hit).sum() > 0, "no blend band"


def test_image_texture_recovery_fit():
    """Differentiable texture: recover a 4x4 texel grid from a rendered
    target by gradient descent on texture_image alone."""
    from ray_tracer_tpu.opt.fit import fit

    rng = np.random.RandomState(7)
    true_tex = rng.uniform(0.2, 1.0, (4, 4, 3)).astype(np.float32)
    prep_true = _quad_prep("image", texture_image=true_tex, texture_scale=1.0)
    target = render(prep_true)

    start = np.full((4, 4, 3), 0.6, np.float32)
    prep0 = _quad_prep("image", texture_image=start, texture_scale=1.0)
    params, losses = fit(prep0, target, steps=40, lr=5e-2,
                         trainable=("texture_image",), log_every=0)
    assert losses[-1] < losses[0] * 0.05, (losses[0], losses[-1])
    got = np.asarray(params.texture_image)
    # the visible texels should move toward the truth
    assert np.abs(got - true_tex).mean() < np.abs(start - true_tex).mean() * 0.6
