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


def test_brute_vs_grid_divergence_behind_camera():
    """The DOCUMENTED limit of the brute/grid A/B property
    (render/renderer.py): under the faithful serial regime the O(N)
    sweep tests every triangle while the grid walk only visits voxels a
    forward walk reaches — a triangle strictly behind the camera is
    shaded by brute (negative-t accept, Serial/geometry.h:164-171) and
    background for the grid."""
    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, RenderConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes

    mesh = MeshArrays(
        verts=np.array([[-4, 2, 8], [4, 2, 8], [0, 6, 8]], np.float32),
        faces=np.array([[0, 1, 2]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((1, 3), np.int32),
    )
    mat = MaterialConfig(base_color=(200.0, 0.0, 0.0), kd=2.0, ks=1.0,
                         spec_alpha=4.0, ka=0.2)
    light = LightConfig(position=(0, 5, 0), intensity=255.0)
    scene = scene_from_meshes([(mesh, 0)], [mat], light)

    def img(traversal):
        cfg = SceneConfig(
            materials=(mat,),
            camera=CameraConfig(position=(0, 2, 6), target=(0, 2, 0),
                                up=(0, -1, 0), fov_degrees=45.0,
                                width=8, height=8),
            light=light,
            render=RenderConfig(shading="serial", faithful=True,
                                det_dtype="float64", ray_tile=64,
                                traversal=traversal),
        )
        return np.asarray(render(prepare(cfg, scene=scene)))

    grid_img, brute_img = img("csr"), img("brute")
    assert (grid_img == 0).all(), "grid walk must never reach behind-camera geometry"
    assert (brute_img != 0).any(), "brute sweep must accept the negative-t hit"


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


def test_choose_fused_shadow_policy():
    """Sparse scene -> fuse; dense full-frame scene -> two-pass."""
    import dataclasses

    import numpy as np

    from ray_tracer_tpu.config import (
        CameraConfig, GridConfig, LightConfig, MaterialConfig, RenderConfig,
        SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes, serial_scene_config
    from ray_tracer_tpu.render.metrics import choose_fused_shadow, estimate_coverage
    from ray_tracer_tpu.render.renderer import prepare

    cfg = serial_scene_config(128, 128)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed", packed_block_tris=14,
            grid=GridConfig(resolution_multiplier=0.75),
        ),
    )
    sparse = prepare(cfg)
    assert choose_fused_shadow(sparse) is True

    # a wall quad filling the whole view = 100% coverage
    quad = MeshArrays(
        verts=np.array([[-9, -9, 0], [9, -9, 0], [9, 9, 0], [-9, 9, 0]],
                       np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((2, 3), np.int32),
    )
    mat = MaterialConfig()
    light = LightConfig(position=(0.0, 0.0, 5.0), intensity=1.0)
    wall = scene_from_meshes([(quad, 0)], [mat], light)
    wcfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0, 0, 3), target=(0, 0, 0), up=(0, 1, 0),
                            fov_degrees=60.0, width=64, height=64),
        light=light,
        render=dataclasses.replace(cfg.render),
    )
    dense = prepare(wcfg, scene=wall)
    assert estimate_coverage(dense) > 0.9
    assert choose_fused_shadow(dense) is False


def test_metrics_match_render_under_faithful_serial():
    """Metrics follow the SAME hit/shadow policy as the renderer
    (primary_gate=None, any_pass acceptance, non-early shadow march):
    primary_hits equals the rendered image's lit-pixel count (every
    accepted lane gets at least its ambient term; background is 0)."""
    from ray_tracer_tpu.models.scenes import serial_scene_config

    cfg = serial_scene_config(32, 32)
    prep = prepare(cfg)
    m = collect_render_metrics(prep)
    img = np.asarray(render(prep))
    lit = int(((img > 0).any(axis=-1)).sum())
    assert m["primary_hits"] == lit, (m["primary_hits"], lit)
    assert m["shadow_hits"] <= m["primary_hits"]


def test_choose_camera_refill_policy():
    """Mostly-dead camera frustum (tight AABB) -> regen+retries; a
    full-coverage wall (every camera ray enters) -> gather refill."""
    import dataclasses

    import numpy as np

    from ray_tracer_tpu.config import (
        CameraConfig, LightConfig, MaterialConfig, SceneConfig,
    )
    from ray_tracer_tpu.io.obj import MeshArrays
    from ray_tracer_tpu.models.scenes import scene_from_meshes, serial_scene_config
    from ray_tracer_tpu.render.metrics import choose_camera_refill
    from ray_tracer_tpu.render.renderer import prepare

    cfg = serial_scene_config(128, 128)
    cfg = dataclasses.replace(
        cfg,
        render=dataclasses.replace(
            cfg.render, faithful=False, det_dtype="float32",
            traversal="packed",
        ),
    )
    # spot+blub occupy a small part of the frustum: 61% of camera rays
    # miss the AABB (the measured number behind the 0.45 threshold)
    assert choose_camera_refill(prepare(cfg)) is True

    quad = MeshArrays(
        verts=np.array([[-99, -99, 0], [99, -99, 0], [99, 99, 0],
                        [-99, 99, 0]], np.float32),
        faces=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
        uvs=np.zeros((1, 2), np.float32),
        uv_faces=np.zeros((2, 3), np.int32),
    )
    mat = MaterialConfig()
    light = LightConfig(position=(0.0, 0.0, 5.0), intensity=1.0)
    wall = scene_from_meshes([(quad, 0)], [mat], light)
    wcfg = SceneConfig(
        materials=(mat,),
        camera=CameraConfig(position=(0, 0, 3), target=(0, 0, 0),
                            up=(0, 1, 0), fov_degrees=60.0,
                            width=64, height=64),
        light=light,
        render=dataclasses.replace(cfg.render),
    )
    assert choose_camera_refill(prepare(wcfg, scene=wall)) is False
