"""Pallas all-pairs intersector (interpret mode on CPU) vs the XLA sweep."""

import dataclasses

import numpy as np

from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.intersect import intersect_brute
from ray_tracer_tpu.ops.pallas_intersect import intersect_brute_pallas


def test_pallas_matches_xla_brute(tiny_prep):
    rays = camera_rays(tiny_prep.cfg.camera)  # 256 rays = one kernel tile
    v0, v1, v2 = tiny_prep.scene.triangle_soa()
    want = intersect_brute(rays, v0, v1, v2, t_lower=1e-4)
    got = intersect_brute_pallas(rays, v0, v1, v2, t_lower=1e-4)
    np.testing.assert_array_equal(np.asarray(want.hit), np.asarray(got.hit))
    h = np.asarray(want.hit)
    np.testing.assert_array_equal(
        np.asarray(want.tri_id)[h], np.asarray(got.tri_id)[h]
    )
    np.testing.assert_allclose(
        np.asarray(want.t)[h], np.asarray(got.t)[h], rtol=1e-5
    )


def test_pallas_padding_lanes_never_hit(tiny_prep):
    """Ray-count padding (inf origins) and triangle padding (degenerate
    zeros) must not produce hits."""
    import jax.numpy as jnp

    v0, v1, v2 = tiny_prep.scene.triangle_soa()
    rays = RayBatch.make(
        jnp.full((3, 3), jnp.inf), jnp.ones((3, 3))
    )
    res = intersect_brute_pallas(rays, v0, v1, v2, t_lower=1e-4)
    assert not np.asarray(res.hit).any()


def test_brute_pallas_render_path(tiny_prep):
    """Full render via traversal='brute_pallas' matches the csr fast path
    up to boundary pixels."""
    from ray_tracer_tpu.io.ppm import tonemap_u8
    from ray_tracer_tpu.render.renderer import prepare, render

    base = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(tiny_prep.cfg.render, faithful=False, ray_tile=64),
    )
    pall = dataclasses.replace(
        base, render=dataclasses.replace(base.render, traversal="brute_pallas", ray_tile=256)
    )
    a = tonemap_u8(np.asarray(render(prepare(base, scene=tiny_prep.scene))))
    b = tonemap_u8(np.asarray(render(prepare(pall, scene=tiny_prep.scene))))
    diff = np.abs(a.astype(int) - b.astype(int)).max(axis=-1)
    assert (diff > 2).mean() < 0.01
