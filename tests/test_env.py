"""Lat-long environment-map backgrounds (Scene.env_image) — miss lanes
sample the map by ray direction at every bounce depth; a production
feature beyond the reference's constant-black background."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.models.scenes import gradcheck_scene
from ray_tracer_tpu.render.renderer import prepare, render


def _prep(env=None, **render_kw):
    scene, cfg = gradcheck_scene(16, 16)
    if env is not None:
        scene = scene._replace(env_image=jnp.asarray(env, jnp.float32))
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64, **render_kw)
    )
    return prepare(cfg, scene=scene)


def test_constant_env_equals_constant_background():
    """A constant map degenerates to the constant-background path
    bitwise (all bilinear deltas are zero)."""
    c = (30.0, 60.0, 90.0)
    base = np.asarray(render(_prep(background=c)))
    env = np.broadcast_to(np.asarray(c, np.float32), (8, 16, 3))
    with_env = np.asarray(render(_prep(env=env, background=(0, 0, 0))))
    np.testing.assert_array_equal(base, with_env)


def test_env_directional_bands():
    """Sky pixels pick up the band their ray direction points into:
    upper hemisphere rows of the map differ from lower ones."""
    env = np.zeros((8, 16, 3), np.float32)
    env[:4] = (200.0, 0.0, 0.0)  # up (v < 0.5): red
    env[4:] = (0.0, 0.0, 200.0)  # down: blue
    prep = _prep(env=env)
    img = np.asarray(render(prep))
    from ray_tracer_tpu.render.aov import render_aovs

    hit = np.asarray(render_aovs(prep)["hit"])
    sky = img[~hit]
    assert len(sky) > 0
    # the camera looks down at the scene from above: sky rays span both
    # hemispheres in this framing, so both bands should appear
    red = (sky[:, 0] > 100) & (sky[:, 2] < 100)
    blue = (sky[:, 2] > 100) & (sky[:, 0] < 100)
    assert red.any() or blue.any()
    # and every sky pixel is one of the two bands (or a pole/seam blend)
    assert ((sky[:, 0] > 1) | (sky[:, 2] > 1)).all()


def test_sample_env_mapping():
    """Direction -> texel mapping: +y samples the top row, -y the
    bottom row, and azimuth wraps."""
    scene, _ = gradcheck_scene(4, 4)
    env = np.zeros((4, 8, 3), np.float32)
    env[0] = (255.0, 0.0, 0.0)  # top row (+y pole)
    env[-1] = (0.0, 255.0, 0.0)  # bottom row (-y pole)
    sc = scene._replace(env_image=jnp.asarray(env))
    d = jnp.asarray([[0.0, 1.0, 0.0], [0.0, -1.0, 0.0]], jnp.float32)
    c = np.asarray(sc.sample_env(d))
    assert c[0, 0] > 200 and c[0, 1] < 50  # up = red
    assert c[1, 1] > 200 and c[1, 0] < 50  # down = green


def test_env_reflection_sees_map():
    """Bounce misses sample the map by the REFLECTED direction: a
    mirror-material scene with an env map picks up env color inside
    reflective surfaces."""
    from ray_tracer_tpu.config import MaterialConfig

    scene, cfg = gradcheck_scene(16, 16)
    mats = (
        dataclasses.replace(cfg.materials[0], reflective=True, km=0.8),
    ) + cfg.materials[1:]
    from ray_tracer_tpu.models.materials import MaterialTable

    scene = scene._replace(
        materials=MaterialTable.from_configs(mats),
        env_image=jnp.full((4, 8, 3), 120.0, jnp.float32),
    )
    cfg = dataclasses.replace(
        cfg,
        materials=mats,
        render=dataclasses.replace(cfg.render, ray_tile=64, max_bounces=2),
    )
    img = np.asarray(render(prepare(cfg, scene=scene)))
    assert np.isfinite(img).all()
    # plane pixels blend the (env-lit) bounce -> strictly brighter than
    # the same render with a black background
    cfg0 = cfg
    scene0 = scene._replace(env_image=None)
    img0 = np.asarray(render(prepare(cfg0, scene=scene0)))
    assert (img >= img0 - 1e-4).all()
    assert (img > img0 + 1.0).any()


def test_env_image_gradient_fd():
    """FD == autodiff for env texels through image_loss (env_image is a
    SceneParams leaf like texture_image)."""
    import jax

    from ray_tracer_tpu.opt.fit import image_loss, split_scene

    env = np.full((4, 8, 3), 50.0, np.float32)
    prep = _prep(env=env)
    g = np.random.default_rng(0)
    target = jnp.asarray(g.uniform(0, 80, size=(16, 16, 3)), jnp.float32)

    def f(params):
        return image_loss(params, prep.scene, prep.grid.arrays,
                          prep.grid.meta, prep.cfg, target)

    params = split_scene(prep.scene)
    val = params.env_image
    grad = jax.grad(f)(params).env_image
    # pick the strongest texel so the FD signal is clean
    idx = np.unravel_index(int(jnp.argmax(jnp.abs(grad))), val.shape)
    tangent = np.zeros(val.shape, np.float64)
    tangent[idx] = 1.0
    tangent = jnp.asarray(tangent, val.dtype)
    analytic = float(jnp.sum(grad * tangent))
    eps = 0.5
    fd = (float(f(params._replace(env_image=val + eps * tangent)))
          - float(f(params._replace(env_image=val - eps * tangent)))
          ) / (2 * eps)
    assert np.isfinite(analytic) and abs(analytic) > 0
    np.testing.assert_allclose(analytic, fd, rtol=2e-2, atol=1e-8)


def test_env_rejects_faithful():
    scene, cfg = gradcheck_scene(8, 8)
    scene = scene._replace(env_image=jnp.zeros((4, 8, 3), jnp.float32))
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, shading="serial",
                                        faithful=True, ray_tile=64)
    )
    with pytest.raises(ValueError, match="faithful"):
        render(prepare(cfg, scene=scene))


def test_env_sharded_matches_single_device(eight_device_mesh):
    from ray_tracer_tpu.parallel.shard import render_sharded

    env = np.zeros((8, 16, 3), np.float32)
    env[:4] = (200.0, 0.0, 0.0)
    env[4:] = (0.0, 0.0, 200.0)
    prep = _prep(env=env)
    single = np.asarray(render(prep))
    sharded = np.asarray(render_sharded(prep, mesh=eight_device_mesh))
    np.testing.assert_array_equal(single, sharded)
