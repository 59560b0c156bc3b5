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


def test_hemisphere_dirs():
    from ray_tracer_tpu.render.aov import hemisphere_dirs

    d = hemisphere_dirs(32)
    assert d.shape == (32, 3)
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, rtol=1e-5)
    assert (d[:, 2] > 0).all()  # upper hemisphere
    # spread in azimuth: xy mean near the axis
    assert np.linalg.norm(d[:, :2].mean(axis=0)) < 0.15


def test_render_ao(tiny_prep):
    """AO darkens the plane near the sphere contact and stays 1 where
    there is no close-by geometry (and on sky pixels)."""
    from ray_tracer_tpu.render.aov import render_ao, render_aovs

    ao = np.asarray(render_ao(tiny_prep, samples=8, radius=1.0))
    assert ao.shape == (16, 16)
    assert (ao >= 0).all() and (ao <= 1).all()
    hit = np.asarray(render_aovs(tiny_prep)["hit"])
    np.testing.assert_array_equal(ao[~hit], 1.0)  # sky = fully open
    assert (ao[hit] < 0.95).any(), "no occluded region found"
    assert (ao[hit] > 0.95).any(), "no open region found"
    # deterministic sample set
    again = np.asarray(render_ao(tiny_prep, samples=8, radius=1.0))
    np.testing.assert_array_equal(ao, again)


def test_render_ao_packed_matches_csr(tiny_prep):
    import dataclasses

    from ray_tracer_tpu.render.aov import render_ao
    from ray_tracer_tpu.render.renderer import prepare

    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(tiny_prep.cfg.render, traversal="packed"),
    )
    prep_p = prepare(cfg, scene=tiny_prep.scene)
    a = np.asarray(render_ao(tiny_prep, samples=8, radius=1.0))
    b = np.asarray(render_ao(prep_p, samples=8, radius=1.0))
    # same hemisphere set, same geometry; traversals may disagree only
    # on razor-thin t<=radius boundary cases
    assert (a != b).mean() < 0.02


def test_render_ao_serial_no_self_occlusion():
    """Serial shading's primary gate is 0, but AO occlusion rays must
    gate t > eps — otherwise every hemisphere ray re-accepts its own
    origin triangle and AO reads ~0.5 on all surfaces."""
    import dataclasses

    from ray_tracer_tpu.models.scenes import gradcheck_scene
    from ray_tracer_tpu.render.aov import render_ao
    from ray_tracer_tpu.render.renderer import prepare

    scene, cfg = gradcheck_scene(16, 16)
    cfg = dataclasses.replace(
        cfg, render=dataclasses.replace(cfg.render, shading="serial",
                                        faithful=False, ray_tile=64)
    )
    ao = np.asarray(render_ao(prepare(cfg, scene=scene), samples=8,
                              radius=1.0))
    # open plane regions far from the spheres must be fully unoccluded
    assert (ao > 0.99).any(), f"max ao {ao.max()} — self-occlusion?"


# ---------------------------------------------------------------------------
# Sharded / ring AOV, AO and pixel debug (round 5)
# ---------------------------------------------------------------------------


def _packed_prep(tiny_prep):
    cfg = dataclasses.replace(
        tiny_prep.cfg,
        render=dataclasses.replace(
            tiny_prep.cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", ray_tile=64,
        ),
    )
    return prepare(cfg, scene=tiny_prep.scene)


def test_aovs_sharded_equals_single(tiny_prep, eight_device_mesh):
    """Ray-sharded AOVs (replicated geometry) are bitwise equal to the
    single-device buffers — the same invariant render_sharded pins."""
    prep = _packed_prep(tiny_prep)
    a = render_aovs(prep)
    b = render_aovs(prep, mesh=eight_device_mesh)
    for k in a:
        np.testing.assert_array_equal(
            np.asarray(a[k]), np.asarray(b[k]), err_msg=k
        )


def test_aovs_ring_equals_single(tiny_prep, eight_device_mesh):
    """Ring-sharded AOVs (geometry sharded, winners carried): ids and
    flags exact, float buffers to traversal arithmetic."""
    prep = _packed_prep(tiny_prep)
    a = render_aovs(prep)
    b = render_aovs(prep, mesh=eight_device_mesh, ring=True)
    hit = np.asarray(a["hit"])
    np.testing.assert_array_equal(hit, np.asarray(b["hit"]))
    np.testing.assert_array_equal(
        np.asarray(a["tri_id"]), np.asarray(b["tri_id"])
    )
    np.testing.assert_array_equal(
        np.asarray(a["material_id"]), np.asarray(b["material_id"])
    )
    np.testing.assert_allclose(
        np.asarray(a["depth"])[hit], np.asarray(b["depth"])[hit],
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(a["normal"]), np.asarray(b["normal"]), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(a["position"]), np.asarray(b["position"]), atol=1e-4
    )


def test_ao_sharded_and_ring_equal_single(tiny_prep, eight_device_mesh):
    """AO counts occluded hemisphere samples (integers per pixel), so
    the sharded and ring variants must match the single-device map
    exactly up to boundary samples; the ring runs every hemisphere
    sample as an occlusion orbit."""
    from ray_tracer_tpu.render.aov import render_ao

    prep = _packed_prep(tiny_prep)
    a = np.asarray(render_ao(prep, samples=8, radius=1.5))
    s = np.asarray(render_ao(prep, samples=8, radius=1.5,
                             mesh=eight_device_mesh))
    np.testing.assert_array_equal(a, s)
    g = np.asarray(render_ao(prep, samples=8, radius=1.5,
                             mesh=eight_device_mesh, ring=True))
    # per-pixel AO is k/8: allow at most one boundary sample to flip
    assert np.abs(a - g).max() <= 1.0 / 8 + 1e-6
    assert (np.abs(a - g) > 1e-6).mean() < 0.05


def test_trace_pixel_ring_matches_single(tiny_prep, eight_device_mesh):
    """The pixel debugger over ring-sharded geometry reports the same
    hit topology and shading inputs as the single-device trace (steps
    excepted — the orbit does not record them)."""
    from ray_tracer_tpu.render.debug import trace_pixel

    prep = _packed_prep(tiny_prep)
    # pick a hit pixel
    hit = np.asarray(render_aovs(prep)["hit"])
    ys, xs = np.nonzero(hit)
    y, x = int(ys[0]), int(xs[0])
    a = trace_pixel(prep, x, y)
    b = trace_pixel(prep, x, y, mesh=eight_device_mesh)
    assert b["steps"] == -1
    for k in ("pixel", "hit", "tri_id", "material_index", "in_shadow"):
        assert a[k] == b[k], k
    np.testing.assert_allclose(a["t"], b["t"], rtol=1e-5)
    np.testing.assert_allclose(a["poi"], b["poi"], rtol=1e-4, atol=1e-5)
    # and a miss pixel reports miss through the ring too
    ys2, xs2 = np.nonzero(~hit)
    m = trace_pixel(prep, int(xs2[0]), int(ys2[0]), mesh=eight_device_mesh)
    assert m["hit"] is False
