"""Config dataclasses: defaults match the reference constants; JSON round-trip."""

import dataclasses

from ray_tracer_tpu.config import (
    CameraConfig,
    LightConfig,
    MaterialConfig,
    MeshConfig,
    RenderConfig,
    SceneConfig,
    load_scene_config,
    save_scene_config,
)


def test_defaults_reproduce_reference_constants():
    cam = CameraConfig()
    assert cam.position == (3.0, 5.0, 3.0)  # Serial/raytracer.cpp:124
    assert cam.up == (0.0, -1.0, 0.0)
    assert cam.fov_degrees == 45.0
    light = LightConfig()
    assert light.position == (5.0, -5.0, 2.0)  # raytracer.cpp:87-89
    assert light.intensity == 255.0
    mat = MaterialConfig()
    assert (mat.kd, mat.ks, mat.spec_alpha, mat.ka) == (2.0, 5.0e11, 4.0, 0.2)
    r = RenderConfig()
    assert r.shadow_eps == 1e-1  # Serial/geometry.h:2
    assert r.grid.max_resolution == 64  # Serial/grid.h:100


def test_json_roundtrip(tmp_path):
    cfg = SceneConfig(
        meshes=(MeshConfig(path="a.obj", material_index=2, offset=(1, 2, 3), scale=5.0),),
        materials=(MaterialConfig(reflective=True, km=0.6), MaterialConfig()),
        camera=CameraConfig(width=17, height=9, fov_degrees=60.0),
        light=LightConfig(position=(2, 5, 0), intensity=1.0),
        render=dataclasses.replace(RenderConfig(), shading="parallel", max_bounces=3),
    )
    p = str(tmp_path / "cfg.json")
    save_scene_config(cfg, p)
    assert load_scene_config(p) == cfg
