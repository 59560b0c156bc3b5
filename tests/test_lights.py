"""Multiple point lights (SceneConfig.extra_lights) — a production
feature beyond the reference's single hard-coded light.  Semantics:
each extra light adds its own shadow-tested diffuse+specular term;
ambient is counted once, riding the primary light's term exactly as
the single-light variants do."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.config import LightConfig
from ray_tracer_tpu.models.scenes import gradcheck_scene
from ray_tracer_tpu.render.renderer import prepare, render


def _with_lights(scene, extra):
    if not extra:
        return scene
    return scene._replace(
        extra_light_pos=jnp.asarray([l.position for l in extra], jnp.float32),
        extra_light_intensity=jnp.asarray(
            [l.intensity for l in extra], jnp.float32
        ),
    )


def _prep(extra=(), **render_kw):
    scene, cfg = gradcheck_scene(16, 16)
    cfg = dataclasses.replace(
        cfg,
        extra_lights=tuple(extra),
        render=dataclasses.replace(cfg.render, ray_tile=64, **render_kw),
    )
    # gradcheck_scene's geometry is procedural (no cfg.meshes), so the
    # extra lights are attached to the scene pytree directly — the same
    # thing prepare()/scene_from_numpy do for config scenes
    return prepare(cfg, scene=_with_lights(scene, extra))


def test_no_extra_lights_bitwise_unchanged():
    base = np.asarray(render(_prep()))
    again = np.asarray(render(_prep(extra=())))
    np.testing.assert_array_equal(base, again)


def test_zero_intensity_extra_light_is_identity():
    """An extra light of intensity 0 contributes exactly nothing
    (its direct term is scaled by the intensity in both variants)."""
    base = np.asarray(render(_prep()))
    z = np.asarray(render(_prep(extra=[LightConfig((0, 8, 0), 0.0)])))
    np.testing.assert_array_equal(base, z)


def test_extra_light_brightens_and_casts_its_own_shadow():
    base = np.asarray(render(_prep()))
    lit = np.asarray(render(_prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)])))
    assert np.isfinite(lit).all()
    # strictly additive terms: nothing gets darker
    assert (lit >= base - 1e-4).all()
    assert (lit > base + 1e-3).any()
    # deterministic
    again = np.asarray(render(_prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)])))
    np.testing.assert_array_equal(lit, again)


def test_serial_light_symmetry():
    """Under serial shading the primary and an extra light use the SAME
    formula (apply_shadow(direct) summed + one ambient), so swapping
    which light is 'primary' must not change the image."""
    scene, cfg = gradcheck_scene(16, 16)
    l1 = LightConfig((4.0, 6.0, 2.0), 0.7)
    l2 = LightConfig((-3.0, 5.0, -1.0), 1.3)

    def img(primary, extra):
        c = dataclasses.replace(
            cfg,
            light=primary,
            extra_lights=(extra,),
            render=dataclasses.replace(cfg.render, shading="serial",
                                       faithful=False, ray_tile=64),
        )
        sc = _with_lights(scene, (extra,))._replace(
            light_pos=jnp.asarray(primary.position, jnp.float32),
            light_intensity=jnp.asarray(primary.intensity, jnp.float32),
        )
        return np.asarray(render(prepare(c, scene=sc)))

    a = img(l1, l2)
    b = img(l2, l1)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-3)


def test_extra_lights_sharded_matches_single_device(eight_device_mesh):
    from ray_tracer_tpu.parallel.shard import render_sharded

    prep = _prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)])
    single = np.asarray(render(prep))
    sharded = np.asarray(render_sharded(prep, mesh=eight_device_mesh))
    np.testing.assert_array_equal(single, sharded)


def test_extra_light_position_gradient_fd():
    """FD == autodiff for an extra light's position through image_loss
    (the extra-light leaves ride SceneParams like the primary's)."""
    import jax

    from ray_tracer_tpu.opt.fit import image_loss, split_scene

    prep = _prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)])
    g = np.random.default_rng(0)
    target = jnp.asarray(g.uniform(0, 80, size=(16, 16, 3)), jnp.float32)

    def f(params):
        return image_loss(params, prep.scene, prep.grid.arrays,
                          prep.grid.meta, prep.cfg, target)

    params = split_scene(prep.scene)
    val = params.extra_light_pos
    tangent = np.zeros(val.shape, np.float64)
    tangent[0, 0] = 1.0
    tangent = jnp.asarray(tangent, val.dtype)
    grad = jax.grad(f)(params)
    analytic = float(jnp.sum(grad.extra_light_pos * tangent))
    eps = 1e-3
    fd = (float(f(params._replace(extra_light_pos=val + eps * tangent)))
          - float(f(params._replace(extra_light_pos=val - eps * tangent)))
          ) / (2 * eps)
    assert np.isfinite(analytic)
    np.testing.assert_allclose(analytic, fd, rtol=2e-2, atol=1e-7)


def test_extra_lights_config_roundtrip(tmp_path):
    from ray_tracer_tpu.config import (
        SceneConfig, load_scene_config, save_scene_config,
    )

    cfg = SceneConfig(extra_lights=(LightConfig((1, 2, 3), 0.5),
                                    LightConfig((4, 5, 6), 2.0)))
    p = str(tmp_path / "cfg.json")
    save_scene_config(cfg, p)
    back = load_scene_config(p)
    assert back.extra_lights == cfg.extra_lights


def test_extra_lights_through_ring_renderer(eight_device_mesh):
    """Extra lights work in ring mode since round 4 (one shadow orbit
    per extra light) — replaced the old rejection test; the ring image
    must match the replicated render."""
    from ray_tracer_tpu.parallel.shard import render_sharded_geometry

    prep = _prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)],
                 faithful=False, det_dtype="float32",
                 traversal="packed", fused_shadow=False)
    want = np.asarray(render(prep))
    got = np.asarray(render_sharded_geometry(prep, mesh=eight_device_mesh))
    np.testing.assert_allclose(got, want, atol=1e-3, rtol=1e-4)


def test_prepare_attaches_cfg_extra_lights_to_provided_scene():
    """cfg.extra_lights reaches scene-OBJECT scenes too (the CLI path
    for gradcheck/nefertiti): prepare() attaches them when the scene
    does not already carry extra lights."""
    scene, cfg = gradcheck_scene(16, 16)
    cfg = dataclasses.replace(
        cfg,
        extra_lights=(LightConfig((-4.0, 6.0, -2.0), 1.0),),
        render=dataclasses.replace(cfg.render, ray_tile=64),
    )
    prep = prepare(cfg, scene=scene)
    assert prep.scene.extra_light_pos is not None
    lit = np.asarray(render(prep))
    base = np.asarray(render(_prep()))
    assert (lit > base + 1e-3).any(), "extra light had no effect"


def test_extra_light_gets_soft_shadows_too():
    """Area-light sampling applies to EVERY light, not just the
    primary (one occlusion_toward policy)."""
    hard = np.asarray(render(_prep(extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)])))
    soft = np.asarray(render(_prep(
        extra=[LightConfig((-4.0, 6.0, -2.0), 1.0)],
        light_radius=0.8, shadow_samples=4,
    )))
    assert np.isfinite(soft).all()
    assert not np.array_equal(hard, soft)


def test_shadow_sample_batch_bitwise_invariant():
    """Area-light shadow samples batched into one wavefront
    (shadow_sample_batch) must produce the BIT-identical image as the
    one-traversal-per-sample path: lanes are (sample, ray)-independent
    and accumulation order is fixed."""
    kw = dict(light_radius=0.6, shadow_samples=5)
    seq = np.asarray(render(_prep(shadow_sample_batch=1, **kw)))
    batched = np.asarray(render(_prep(shadow_sample_batch=4, **kw)))
    allb = np.asarray(render(_prep(shadow_sample_batch=8, **kw)))
    np.testing.assert_array_equal(seq, batched)
    np.testing.assert_array_equal(seq, allb)


def test_shadow_sample_batch_invariant_persistent():
    """Same invariance under the persistent scheduler + packed grid."""
    kw = dict(light_radius=0.6, shadow_samples=4, faithful=False,
              traversal="packed", scheduler="persistent", wave=256)
    seq = np.asarray(render(_prep(shadow_sample_batch=1, **kw)))
    batched = np.asarray(render(_prep(shadow_sample_batch=4, **kw)))
    np.testing.assert_array_equal(seq, batched)
