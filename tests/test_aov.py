"""AOV buffers: shapes, miss sentinels, consistency with the render."""

import dataclasses

import numpy as np

from ray_tracer_tpu.render.aov import render_aovs
from ray_tracer_tpu.render.renderer import prepare


def test_aov_buffers(tiny_prep):
    aov = render_aovs(tiny_prep)
    h = w = 16
    assert aov["depth"].shape == (h, w)
    assert aov["normal"].shape == (h, w, 3)
    hit = np.asarray(aov["hit"])
    depth = np.asarray(aov["depth"])
    tri = np.asarray(aov["tri_id"])
    mat = np.asarray(aov["material_id"])
    nrm = np.asarray(aov["normal"])
    assert hit.any() and not hit.all()
    assert np.isinf(depth[~hit]).all() and np.isfinite(depth[hit]).all()
    assert (tri[~hit] == -1).all() and (tri[hit] >= 0).all()
    assert (mat[~hit] == -1).all() and (mat[hit] >= 0).all()
    lens = np.linalg.norm(nrm[hit], axis=-1)
    np.testing.assert_allclose(lens, 1.0, atol=1e-5)
    assert (np.linalg.norm(nrm[~hit], axis=-1) == 0).all()


def test_aov_packed_matches_csr(tiny_prep):
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, traversal="packed", ray_tile=64
        ),
    )
    packed_prep = prepare(cfg, scene=tiny_prep.scene)
    a = render_aovs(tiny_prep)
    b = render_aovs(packed_prep)
    np.testing.assert_array_equal(np.asarray(a["hit"]), np.asarray(b["hit"]))
    h = np.asarray(a["hit"])
    np.testing.assert_array_equal(
        np.asarray(a["tri_id"])[h], np.asarray(b["tri_id"])[h]
    )
