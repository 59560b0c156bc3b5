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


def _quad_prep(texture: str, base_scale: float = 1.0):
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
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 5.0, 0.01), target=(0, 0, 0),
                            up=(0, 0, 1), fov_degrees=45.0, width=32, height=32),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, max_bounces=0,
            shadow_eps=1e-3, shadow_scale=0.5, ray_tile=256,
            texture=texture, texture_scale=2.0,
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
