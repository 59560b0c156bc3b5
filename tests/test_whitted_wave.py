"""Cross-depth Whitted wave (round 5, ops/whitted_wave.py): the mirror
recursion in ONE persistent while_loop, parity-pinned against the
per-depth bounce-loop renderer."""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.models.scenes import gradcheck_scene, serial_scene_config
from ray_tracer_tpu.render.renderer import (
    _render_whitted_wave,
    prepare,
    render,
    whitted_wave_eligible,
)


def _mirror_prep(mb=2, pump=2, **render_kw):
    scene, cfg = gradcheck_scene(24, 24)
    mats = scene.materials._replace(
        reflective=jnp.asarray([False, True]),
        km=jnp.asarray([0.0, 0.6], jnp.float32),
    )
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=256,
            pump=pump, max_bounces=mb, fused_shadow=True, **render_kw,
        ),
    )
    return prepare(cfg, scene=scene._replace(materials=mats))


def _pair(prep):
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto"),
    )
    w = np.asarray(_render_whitted_wave(prep._replace(cfg=cfg_on)))
    s = np.asarray(render(prep))
    return w, s


@pytest.mark.parametrize("mb,pump", [(0, 1), (1, 2), (3, 4)])
def test_wave_matches_bounce_loop_mirrors(mb, pump):
    """Mirror recursion through the wave == the bounce-loop renderer to
    float association (the forward km-blend accumulation; directions
    and visibility are deterministic, so there is no sampling caveat
    here — every depth matches everywhere)."""
    w, s = _pair(_mirror_prep(mb=mb, pump=pump))
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=1e-4)


def test_wave_matches_bounce_loop_background():
    """Miss lanes at every depth pick up the constant background with
    the running km-weight (an off-grid bounce is next depth's miss)."""
    w, s = _pair(_mirror_prep(mb=3, background=(25.0, 10.0, 5.0)))
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=1e-4)


def test_wave_matches_serial_variant():
    """Serial-variant shading (unnormalized h, intensity scaling,
    ambient after the shadow scale, the negated shadow direction quirk)
    plus the EXACT zero-direct shadow skip."""
    cfg = serial_scene_config(32, 32)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", scheduler="persistent", wave=512, pump=2,
        ),
    )
    w, s = _pair(prepare(cfg))
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=2e-2)


def test_wave_run_to_run_deterministic():
    prep = _mirror_prep(mb=2)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto"),
    )
    p = prep._replace(cfg=cfg_on)
    a = np.asarray(_render_whitted_wave(p))
    b = np.asarray(_render_whitted_wave(p))
    np.testing.assert_array_equal(a, b)


def test_wave_eligibility_and_fallback():
    prep = _mirror_prep(mb=2)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto"),
    )
    assert whitted_wave_eligible(prep._replace(cfg=cfg_on))
    # default off
    assert not whitted_wave_eligible(prep)
    # spp > 1 is ELIGIBLE (subsample-indexed queue); soft shadows are
    # not: "on" raises, "auto" falls back
    cfg_spp = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto",
                                   spp=2),
    )
    assert whitted_wave_eligible(prep._replace(cfg=cfg_spp))
    cfg_bad = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="on",
                                   shadow_samples=8, light_radius=0.5),
    )
    with pytest.raises(ValueError):
        whitted_wave_eligible(prep._replace(cfg=cfg_bad))
    # env maps fall back too
    cfg_a = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto"),
    )
    prep_env = prep._replace(
        cfg=cfg_a,
        scene=prep.scene._replace(env_image=jnp.ones((4, 8, 3), jnp.float32)),
    )
    assert not whitted_wave_eligible(prep_env)


def test_render_dispatch_takes_wave():
    """render() routes eligible forward renders through the wave when
    the knob is on — and the image still matches the bounce loop."""
    prep = _mirror_prep(mb=2)
    s = np.asarray(render(prep))
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="on"),
    )
    w = np.asarray(render(prep._replace(cfg=cfg_on)))
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=1e-4)


def test_wave_spp_matches_bounce_loop():
    """spp > 1 through the wave: the queue holds subsample items and
    the fold reproduces accumulate_spp's sequential association — the
    anti-aliased mirror render matches the bounce loop (deterministic:
    Whitted has no sampling)."""
    w, s = _pair(_mirror_prep(mb=2, spp=2))
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=1e-4)


def test_wave_dof_matches_bounce_loop():
    """Thin-lens depth of field rides spp: camera_ray_at regenerates
    each subsample's golden-spiral lens point bitwise, so the defocused
    wave image matches the bounce loop."""
    import dataclasses as _dc

    prep = _mirror_prep(mb=1, spp=2)
    cfg = _dc.replace(
        prep.cfg,
        camera=_dc.replace(prep.cfg.camera, aperture=0.2,
                           focus_distance=3.0),
    )
    from ray_tracer_tpu.render.renderer import prepare as _prepare

    prep = _prepare(cfg, scene=prep.scene)
    w, s = _pair(prep)
    np.testing.assert_allclose(w, s, rtol=1e-5, atol=1e-4)


@pytest.mark.parametrize("balance", [True, False])
def test_sharded_wave_equals_single(eight_device_mesh, balance):
    """The sharded Whitted wave (round 5 cont.): each shard's queue
    regenerates ITS pixels from (offset, stride) arithmetic — both the
    round-robin balance striding and contiguous slices — so the
    sharded image equals the single-device wave exactly."""
    from ray_tracer_tpu.parallel.shard import render_sharded

    prep = _mirror_prep(mb=2)
    cfg_on = dataclasses.replace(
        prep.cfg,
        render=dataclasses.replace(prep.cfg.render, whitted_wave="auto"),
    )
    p = prep._replace(cfg=cfg_on)
    single = np.asarray(_render_whitted_wave(p))
    sharded = np.asarray(
        render_sharded(p, mesh=eight_device_mesh, balance=balance)
    )
    np.testing.assert_allclose(sharded, single, rtol=1e-6, atol=1e-5)
