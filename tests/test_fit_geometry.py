"""End-to-end inverse rendering of GEOMETRY: recover a vertex
perturbation with grid rebuilds between steps, and multi-bounce
gradients stay finite (regression for the retired-lane nan fix)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.opt.fit import fit, image_loss, merge_scene, split_scene
from ray_tracer_tpu.render.renderer import prepare, render


def test_vertex_fit_reduces_loss(tiny_prep):
    prep = tiny_prep
    target = render(prep)

    params = split_scene(prep.scene)
    g = np.random.default_rng(3)
    bump = jnp.asarray(
        g.normal(scale=0.03, size=params.verts.shape), params.verts.dtype
    )
    perturbed = merge_scene(params._replace(verts=params.verts + bump), prep.scene)
    prep_p = prepare(prep.cfg, scene=perturbed)

    _, losses = fit(
        prep_p, target, steps=12, lr=5e-3, trainable=("verts",),
        rebuild_grid_every=4, log_every=0,
    )
    assert losses[-1] < losses[0], losses


def test_multibounce_gradients_finite(tiny_prep):
    """Reflective materials + 2 bounces: retired-lane inf origins must
    not leak nan into the backward pass."""
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, max_bounces=2, ray_tile=64
        ),
    )
    scene = tiny_prep.scene
    # make material 1 (the spheres) reflective
    mats = scene.materials._replace(
        reflective=jnp.asarray([False, True]),
        km=jnp.asarray([0.0, 0.5], jnp.float32),
    )
    scene = scene._replace(materials=mats)
    prep = prepare(cfg, scene=scene)
    params = split_scene(prep.scene)
    target = jnp.zeros((16, 16, 3), jnp.float32)
    g = jax.grad(image_loss)(
        params, prep.scene, prep.grid.arrays, prep.grid.meta, prep.cfg, target
    )
    for leaf in jax.tree.leaves(g):
        assert np.isfinite(np.asarray(leaf)).all()
