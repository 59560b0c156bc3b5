"""Multi-host helpers (single-process degenerate case) and the scaling
machinery on the 8-virtual-device mesh."""

import numpy as np

from ray_tracer_tpu.parallel import multihost
from ray_tracer_tpu.parallel.scaling import balance_report, scaling_report


def test_multihost_single_process_helpers():
    multihost.initialize()  # no-op / info-log in single-process mode
    assert multihost.is_host0()
    lo, hi = multihost.host_tile_bounds(1000)
    assert (lo, hi) == (0, 1000)
    mesh = multihost.global_mesh(("rays",))
    assert mesh.shape["rays"] == len(__import__("jax").devices())
    scene = {"a": np.ones(3)}
    assert multihost.broadcast_scene_host0(scene) is scene


def test_scaling_report_runs(tiny_prep):
    rep = scaling_report(tiny_prep, device_counts=[1, 2, 4], repeats=1)
    assert [r["devices"] for r in rep["rows"]] == [1, 2, 4]
    assert rep["rows"][0]["efficiency"] == 1.0
    assert all(r["mrays_per_s"] > 0 for r in rep["rows"])


def test_balance_report_round_robin_beats_contiguous(tiny_prep):
    rep = balance_report(tiny_prep, n_shards=8)
    assert 0 < rep["balance_contiguous"] <= 1
    assert 0 < rep["balance_round_robin"] <= 1
    # round-robin interleave should never be materially worse
    assert rep["balance_round_robin"] >= rep["balance_contiguous"] - 0.05


def test_nefertiti_scene_builds():
    from ray_tracer_tpu.models.scenes import nefertiti_scene
    from ray_tracer_tpu.render.renderer import prepare, render

    scene, cfg = nefertiti_scene(width=16, height=16, n_lat=24, n_lon=32)
    import dataclasses

    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, ray_tile=64)
    )
    prep = prepare(cfg, scene=scene)
    img = np.asarray(render(prep))
    assert img.shape == (16, 16, 3)
    assert img.max() > 0
