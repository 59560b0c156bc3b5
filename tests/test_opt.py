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
