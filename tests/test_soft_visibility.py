"""Soft-edge visibility (SURVEY hard part #2): hard shadows stay
bit-exact when the flag is off; with it on, shadow attenuation is
continuous in the blocker's vertices and finite-difference checkable."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.config import (
    CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
)
from ray_tracer_tpu.io.obj import MeshArrays
from ray_tracer_tpu.models.scenes import scene_from_meshes
from ray_tracer_tpu.opt.fit import image_loss, split_scene
from ray_tracer_tpu.render.renderer import prepare, render


def _blocker_scene(soft: float):
    """A floor square and a small blocker triangle between it and the
    light; the camera looks at the shadowed floor."""
    floor = MeshArrays(
        verts=np.array([[-3, 0, -3], [3, 0, -3], [3, 0, 3], [-3, 0, 3]], np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((2, 3), np.int32),
    )
    blocker = MeshArrays(
        verts=np.array([[-0.7, 1.5, -0.7], [0.7, 1.5, -0.7], [0.0, 1.5, 0.9]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((1, 3), np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 200.0, 200.0), kd=2.0, ks=1.0,
                         spec_alpha=4.0, ka=0.2)
    light = LightConfig(position=(0.0, 6.0, 0.0), intensity=1.0)
    scene = scene_from_meshes([(floor, 0), (blocker, 0)], [mat], light)
    cfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0.0, 4.0, 3.5), target=(0, 0, 0),
                            up=(0, 1, 0), fov_degrees=50.0, width=24, height=24),
        light=light,
        render=RenderConfig(
            shading="parallel", faithful=False, max_bounces=0,
            shadow_eps=1e-3, shadow_scale=0.5, ray_tile=64,
            soft_visibility=soft,
        ),
    )
    return prepare(cfg, scene=scene)


def test_soft_off_is_bit_identical_to_default():
    hard1 = np.asarray(render(_blocker_scene(0.0)))
    prep = _blocker_scene(0.0)
    hard2 = np.asarray(render(prep))
    np.testing.assert_array_equal(hard1, hard2)
    assert (hard1 != np.asarray(render(_blocker_scene(0.05)))).any(), (
        "soft shadows should change the image near silhouettes"
    )


def test_soft_shadow_factor_bounded():
    img_hard = np.asarray(render(_blocker_scene(0.0)))
    img_soft = np.asarray(render(_blocker_scene(0.05)))
    # soft image is pointwise between fully-lit and fully-shadowed
    assert img_soft.min() >= 0
    assert (img_soft >= img_hard - 1e-4).all()  # soft never darker than hard


def test_blocker_vertex_gradient_fd():
    """FD check of d loss / d blocker-vertex through the soft shadow.
    The perturbation shrinks the blocker in-plane so no shadow ray flips
    between hit and miss — the sigmoid path is smooth there."""
    prep = _blocker_scene(0.1)
    target = jnp.zeros((24, 24, 3), jnp.float32)

    def loss(params):
        return image_loss(
            params, prep.scene, prep.grid.arrays, prep.grid.meta, prep.cfg, target
        )

    params = split_scene(prep.scene)
    # blocker vertex index 4+2 = 6 (floor has 4 verts), move its z
    vidx, comp = 6, 2
    tangent = np.zeros(params.verts.shape, np.float64)
    tangent[vidx, comp] = 1.0
    tangent = jnp.asarray(tangent, params.verts.dtype)

    g = jax.grad(loss)(params)
    analytic = float(jnp.sum(g.verts * tangent))
    eps = 2e-3

    def at(h):
        return float(loss(params._replace(verts=params.verts + h * tangent)))

    fd = (at(eps) - at(-eps)) / (2 * eps)
    assert np.isfinite(analytic) and abs(analytic) > 0
    np.testing.assert_allclose(analytic, fd, rtol=0.05)
