"""Optimization loop: loss decreases; checkpoint save/restore round-trips."""

import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.opt.checkpoint import restore_checkpoint, save_checkpoint
from ray_tracer_tpu.opt.fit import (
    image_loss, make_train_step, merge_scene, split_scene,
)


def test_fit_reduces_loss(tiny_prep):
    prep = tiny_prep
    # Target: the render of the TRUE scene; perturb materials and recover.
    from ray_tracer_tpu.render.renderer import render

    target = render(prep)
    params = split_scene(prep.scene)
    perturbed = params._replace(
        kd=params.kd * 1.8, ka=params.ka * 0.3,
        base_color=params.base_color * 0.7,
    )
    step, init = make_train_step(
        prep.grid.meta, prep.cfg, optimizer="adam", lr=5e-2,
        trainable=("base_color", "kd", "ka"),
    )
    opt_state = init(perturbed)
    p = perturbed
    losses = []
    for _ in range(15):
        p, opt_state, loss = step(p, opt_state, prep.scene, prep.grid.arrays, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses


def test_merge_split_roundtrip(tiny_prep):
    scene = tiny_prep.scene
    params = split_scene(scene)
    merged = merge_scene(params, scene)
    np.testing.assert_array_equal(np.asarray(merged.verts), np.asarray(scene.verts))
    np.testing.assert_array_equal(
        np.asarray(merged.materials.kd), np.asarray(scene.materials.kd)
    )


def test_checkpoint_restore_latest_step(tiny_prep, tmp_path):
    """restore with no step_num falls back to the highest step_N dir."""
    params = split_scene(tiny_prep.scene)
    d = str(tmp_path / "ckpt2")
    save_checkpoint(d, params, step_num=5)
    save_checkpoint(d, params._replace(kd=params.kd * 2), step_num=9)
    p2, _ = restore_checkpoint(d, {"params": params, "opt_state": None})
    np.testing.assert_array_equal(
        np.asarray(p2.kd), np.asarray(params.kd) * 2
    )


def test_checkpoint_roundtrip(tiny_prep, tmp_path):
    params = split_scene(tiny_prep.scene)
    step, init = make_train_step(tiny_prep.grid.meta, tiny_prep.cfg)
    opt_state = init(params)
    d = str(tmp_path / "ckpt")
    save_checkpoint(d, params, opt_state, step_num=3)
    like = {"params": params, "opt_state": opt_state}
    p2, o2 = restore_checkpoint(d, like, step_num=3)
    for a, b in zip(
        np.asarray(params.verts).ravel(), np.asarray(p2.verts).ravel()
    ):
        assert a == b
    assert o2 is not None


def test_fit_on_packed_traversal(tiny_prep):
    """fit() selects the packed grid when cfg uses the production path
    (regression: previously crashed with AttributeError on GridMeta)."""
    import dataclasses

    from ray_tracer_tpu.opt.fit import fit
    from ray_tracer_tpu.render.renderer import prepare, render

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, traversal="packed", ray_tile=64
        ),
    )
    prep = prepare(cfg, scene=tiny_prep.scene)
    target = render(prep)
    from ray_tracer_tpu.opt.fit import merge_scene, split_scene

    p = split_scene(prep.scene)
    prep = prep._replace(scene=merge_scene(p._replace(kd=p.kd * 1.6), prep.scene))
    _, losses = fit(prep, target, steps=6, lr=5e-2, trainable=("kd",), log_every=0)
    assert losses[-1] < losses[0]


def test_npz_checkpoint_template_without_opt_state(tiny_prep, tmp_path, monkeypatch):
    """npz fallback: restoring params-only from a checkpoint saved WITH
    opt_state must return the params, not optimizer moments (regression
    for the leaf-ordering bug), and the reverse raises clearly."""
    import builtins
    import sys

    real_import = builtins.__import__

    def no_orbax(name, *a, **k):
        if name.startswith("orbax"):
            raise ImportError("forced npz fallback")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_orbax)
    sys.modules.pop("orbax.checkpoint", None)

    params = split_scene(tiny_prep.scene)
    step, init = make_train_step(tiny_prep.grid.meta, tiny_prep.cfg)
    opt_state = init(params)
    d = str(tmp_path / "npzck")
    save_checkpoint(d, params, opt_state, step_num=1)
    import json, os
    with open(os.path.join(d, "step_1", "meta.json")) as fh:
        assert json.load(fh)["backend"] == "npz"

    # params-only template: must get params back, not Adam moments
    p2, o2 = restore_checkpoint(d, {"params": params, "opt_state": None}, step_num=1)
    np.testing.assert_array_equal(np.asarray(p2.kd), np.asarray(params.kd))
    assert o2 is None

    # checkpoint saved WITHOUT opt_state + template requesting it: clear error
    d2 = str(tmp_path / "npzck2")
    save_checkpoint(d2, params, step_num=1)
    import pytest as _pytest
    with _pytest.raises(ValueError, match="without opt_state"):
        restore_checkpoint(d2, {"params": params, "opt_state": opt_state}, step_num=1)


def test_fit_persistent_camera_refill_matches_tiled(tiny_prep):
    """The persistent-scheduler fit forward regenerates popped rays from
    their pixel index (the zero-gather camera refill, camera_ok in
    opt.fit._render_flat) instead of gathering the caller's ray table.
    That is only sound because image_loss/_train_step_fn pass the full
    camera batch in natural pixel order — pin loss AND gradients against
    the tiled scheduler, which consumes the ray table as given."""
    import dataclasses

    import jax

    from ray_tracer_tpu.render.renderer import prepare, render

    def cfg_with(scheduler):
        return dataclasses.replace(
            tiny_prep.cfg,
            render=dataclasses.replace(
                tiny_prep.cfg.render, faithful=False, traversal="packed",
                ray_tile=64, scheduler=scheduler, wave=128,
            ),
        )

    prep_t = prepare(cfg_with("tiled"), scene=tiny_prep.scene)
    prep_p = prepare(cfg_with("persistent"), scene=tiny_prep.scene)
    target = render(prep_t)
    params = split_scene(prep_t.scene)._replace(
        kd=split_scene(prep_t.scene).kd * 1.5
    )

    def loss_and_grad(prep):
        fn = jax.value_and_grad(image_loss)
        return fn(params, prep.scene, prep.packed.arrays, prep.packed.meta,
                  prep.cfg, target)

    lt, gt = loss_and_grad(prep_t)
    lp, gp = loss_and_grad(prep_p)
    np.testing.assert_allclose(float(lp), float(lt), rtol=1e-5)
    for f in gt._fields:
        if getattr(gt, f) is None:  # absent optional leaf (texture_image)
            assert getattr(gp, f) is None
            continue
        np.testing.assert_allclose(
            np.asarray(getattr(gp, f)), np.asarray(getattr(gt, f)),
            rtol=1e-4, atol=1e-7, err_msg=f,
        )

    # one optimizer step through the persistent path stays finite and
    # the short fit reduces the loss (exercises _train_step_fn's
    # camera_ok routing end-to-end)
    from ray_tracer_tpu.opt.fit import fit

    prep_fit = prep_p._replace(scene=merge_scene(params, prep_p.scene))
    _, losses = fit(prep_fit, target, steps=6, lr=5e-2, trainable=("kd",),
                    log_every=0)
    assert losses[-1] < losses[0]


def test_incomplete_checkpoint_skipped_on_resume(tmp_path):
    """A step_N directory without meta.json (a pre-atomic-save crash or
    a foreign dir) must not be selected by latest_step — resume falls
    back to the newest COMPLETE checkpoint instead of crashing."""
    import os

    from ray_tracer_tpu.opt.checkpoint import (
        latest_step, restore_checkpoint, save_checkpoint,
    )

    params = {"w": np.arange(4.0, dtype=np.float32)}
    d = str(tmp_path / "ck")
    save_checkpoint(d, params, step_num=10)
    os.makedirs(os.path.join(d, "step_20"))  # interrupted save: no meta
    assert latest_step(d) == 10
    got, _ = restore_checkpoint(d, {"params": params}, step_num=latest_step(d))
    np.testing.assert_array_equal(got["w"], params["w"])


def test_checkpoint_save_is_atomic(tmp_path):
    """save_checkpoint commits via os.replace: no .tmp staging dir
    survives, and an existing checkpoint is replaced whole."""
    import os

    from ray_tracer_tpu.opt.checkpoint import restore_checkpoint, save_checkpoint

    d = str(tmp_path / "ck")
    a = {"w": np.zeros(3, np.float32)}
    b = {"w": np.ones(3, np.float32)}
    save_checkpoint(d, a, step_num=1)
    save_checkpoint(d, b, step_num=1)  # overwrite same step
    assert not any(n.endswith(".tmp") for n in os.listdir(d))
    got, _ = restore_checkpoint(d, {"params": a}, step_num=1)
    np.testing.assert_array_equal(got["w"], b["w"])


def test_sharded_fit_env_padding_zero_residual(tiny_prep, eight_device_mesh):
    """With an env map, padding miss lanes render an env lookup, not
    the background-padded target: the padding mask must keep a perfect
    render at (near-)zero loss even when rays don't divide the shards."""
    import dataclasses

    import jax.numpy as jnp

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.opt.fit import make_train_step, split_scene
    from ray_tracer_tpu.render.renderer import prepare, render

    scene, cfg = gradcheck_scene(5, 5)  # 25 rays: pads to 32 on 8 shards
    scene = scene._replace(env_image=jnp.full((4, 8, 3), 90.0, jnp.float32))
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=32)
    )
    prep = prepare(cfg, scene=scene)
    target = render(prep)
    step, init = make_train_step(prep.grid.meta, prep.cfg,
                                 mesh=eight_device_mesh, axis="rays")
    params = split_scene(prep.scene)
    _, _, loss = step(params, init(params), prep.scene, prep.grid.arrays,
                      target)
    assert float(loss) < 1e-10, float(loss)


def test_fit_resume_respects_total_step_budget(tiny_prep, tmp_path):
    """`steps` is the TOTAL budget: a run checkpointed at step k and
    relaunched with identical arguments executes only steps k..steps-1."""
    from ray_tracer_tpu.opt.fit import fit
    from ray_tracer_tpu.render.renderer import render

    target = render(tiny_prep)
    d = str(tmp_path / "ck")
    _, l1 = fit(tiny_prep, target, steps=2, lr=1e-3, checkpoint_dir=d,
                checkpoint_every=1, log_every=0,
                trainable=("base_color",))
    assert len(l1) == 2
    _, l2 = fit(tiny_prep, target, steps=3, lr=1e-3, checkpoint_dir=d,
                checkpoint_every=1, resume=True, log_every=0,
                trainable=("base_color",))
    assert len(l2) == 1  # only step 2 remains of the 3-step budget
    import os

    assert os.path.isdir(os.path.join(d, "step_3"))


def test_sharded_fit_spp2_matches_single_device(tiny_prep, eight_device_mesh):
    """spp > 1 on a mesh: the pixel-major regroup hands each shard every
    subsample of its pixels, so the sharded loss and SGD update match
    the single-device spp=2 step (cross-shard subsample averaging)."""
    import dataclasses

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.opt.fit import make_train_step, split_scene
    from ray_tracer_tpu.render.renderer import prepare, render

    scene, cfg = gradcheck_scene(6, 6)  # 36 pixels: pads to 40 on 8 shards
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64, spp=2)
    )
    prep = prepare(cfg, scene=scene)
    target = render(prep)  # spp-averaged self-target
    params = split_scene(prep.scene)
    tr = ("verts", "light_pos")
    sstep, sinit = make_train_step(prep.grid.meta, prep.cfg, optimizer="sgd",
                                   lr=1e-3, trainable=tr)
    rp, _, rloss = sstep(params, sinit(params), prep.scene,
                         prep.grid.arrays, target)
    mstep, minit = make_train_step(prep.grid.meta, prep.cfg, optimizer="sgd",
                                   lr=1e-3, mesh=eight_device_mesh,
                                   axis="rays", trainable=tr)
    mp, _, mloss = mstep(params, minit(params), prep.scene,
                         prep.grid.arrays, target)
    # a perfect-render self-target: both losses ~0
    assert float(rloss) < 1e-10 and float(mloss) < 1e-10
    np.testing.assert_allclose(np.asarray(mp.verts), np.asarray(rp.verts),
                               atol=1e-6)


def test_sharded_fit_spp2_nonzero_target(tiny_prep, eight_device_mesh):
    """Same, against a non-trivial target (finite loss + real grads)."""
    import dataclasses

    import jax.numpy as jnp

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.opt.fit import make_train_step, split_scene
    from ray_tracer_tpu.render.renderer import prepare

    scene, cfg = gradcheck_scene(8, 8)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64, spp=2)
    )
    prep = prepare(cfg, scene=scene)
    target = jnp.full((8, 8, 3), 55.0, jnp.float32)
    params = split_scene(prep.scene)
    tr = ("verts", "base_color", "light_pos")
    sstep, sinit = make_train_step(prep.grid.meta, prep.cfg, optimizer="sgd",
                                   lr=1e-3, trainable=tr)
    rp, _, rloss = sstep(params, sinit(params), prep.scene,
                         prep.grid.arrays, target)
    mstep, minit = make_train_step(prep.grid.meta, prep.cfg, optimizer="sgd",
                                   lr=1e-3, mesh=eight_device_mesh,
                                   axis="rays", trainable=tr)
    mp, _, mloss = mstep(params, minit(params), prep.scene,
                         prep.grid.arrays, target)
    np.testing.assert_allclose(float(mloss), float(rloss), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(mp.verts), np.asarray(rp.verts),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(mp.base_color),
                               np.asarray(rp.base_color), rtol=1e-4,
                               atol=1e-8)
