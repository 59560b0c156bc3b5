"""Cross-path A/B checks (reference-style), metrics, determinism, and
the exact plane-generator port."""

import dataclasses

import numpy as np

from ray_tracer_tpu.io.obj import load_obj
from ray_tracer_tpu.models.meshes import make_reference_plane
from ray_tracer_tpu.models.scenes import asset
from ray_tracer_tpu.render.metrics import collect_render_metrics
from ray_tracer_tpu.render.renderer import prepare, render


def test_reference_plane_generator_is_byte_exact():
    """Port of plane_mesh_creator.py must reproduce assets/plane.obj
    exactly (10,404 verts / 20,402 faces incl. the one-step-past-edge
    quirk and (A,C,B),(A,D,C) winding)."""
    gen = make_reference_plane()
    ref = load_obj(asset("plane.obj"), use_native=False)
    np.testing.assert_array_equal(gen.verts, ref.verts)
    np.testing.assert_array_equal(gen.faces, ref.faces)


def _with(cfg, **render_kw):
    return dataclasses.replace(cfg, render=dataclasses.replace(cfg.render, **render_kw))


def test_brute_traversal_matches_csr_faithful(tiny_prep):
    """The naive O(N) integrator is the reference's kept-in-tree
    cross-check (Serial/raytracer.cpp:171): swapping it in must give the
    IDENTICAL image to the grid path (same eps regime, f64 dets)."""
    cfg_grid = _with(tiny_prep.cfg, det_dtype="float64")
    cfg_brute = _with(tiny_prep.cfg, det_dtype="float64", traversal="brute")
    a = np.asarray(render(prepare(cfg_grid, scene=tiny_prep.scene)))
    b = np.asarray(render(prepare(cfg_brute, scene=tiny_prep.scene)))
    np.testing.assert_array_equal(a, b)


def test_render_is_deterministic(tiny_prep):
    """SURVEY §5: the queue races of the CUDA wavefront cannot happen by
    construction — repeated renders are bit-identical."""
    a = np.asarray(render(tiny_prep))
    b = np.asarray(render(tiny_prep))
    np.testing.assert_array_equal(a, b)


def test_collect_render_metrics(tiny_prep):
    m = collect_render_metrics(tiny_prep)
    assert m["primary_rays"] == 16 * 16
    assert 0 < m["primary_hit_rate"] <= 1
    assert m["shadow_hits"] <= m["primary_hits"]
    assert m["grid_nnz"] > 0
    assert m["primary_steps_max"] >= m["primary_steps_mean"]


def test_collect_render_metrics_packed(tiny_prep):
    cfg = _with(tiny_prep.cfg, faithful=False, traversal="packed")
    prep = prepare(cfg, scene=tiny_prep.scene)
    m = collect_render_metrics(prep)
    assert m["packed_blocks"] > 0
    assert 0 < m["primary_hit_rate"] <= 1
