"""CLI smoke tests (in-process, forced-CPU via conftest)."""

import json
import os

import numpy as np
import pytest

from ray_tracer_tpu import cli
from ray_tracer_tpu.io.ppm import read_ppm


def test_render_command(tmp_path, capsys):
    out = str(tmp_path / "img.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", out, "--fast"])
    img = read_ppm(out)
    assert img.shape == (16, 16, 3)
    assert img.max() > 0  # something was shaded


def test_render_png_output(tmp_path):
    from ray_tracer_tpu.io.png import read_png

    out = str(tmp_path / "img.png")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", out, "--fast"])
    ppm = str(tmp_path / "img.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", ppm, "--fast"])
    np.testing.assert_array_equal(read_png(out), read_ppm(ppm))


def test_render_sharded_command(tmp_path):
    out = str(tmp_path / "img8.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", out, "--fast", "--devices", "8"])
    single = str(tmp_path / "img1.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", single, "--fast"])
    np.testing.assert_array_equal(read_ppm(out), read_ppm(single))


def test_render_ring_command(tmp_path):
    """--ring shards the GEOMETRY and ring-passes rays; the image must
    match the plain render to ring-grid tolerance (per-shard grids can
    flip boundary pixels)."""
    out = str(tmp_path / "ring8.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", out, "--fast", "--devices", "8", "--ring"])
    single = str(tmp_path / "ring1.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", single, "--fast"])
    a = read_ppm(out).astype(int)
    b = read_ppm(single).astype(int)
    assert (np.abs(a - b).max(axis=-1) > 2).mean() < 0.02


def test_info_command(capsys):
    cli.main(["info"])
    info = json.loads(capsys.readouterr().out)
    assert len(info["devices"]) >= 8


def test_stats_command(capsys):
    cli.main(["stats", "--scene", "gradcheck", "--width", "16", "--fast"])
    m = json.loads(capsys.readouterr().out)
    assert m["primary_rays"] == 256


def test_debug_command(capsys):
    cli.main(["debug", "--scene", "gradcheck", "--width", "16",
              "--x", "8", "--y", "12", "--fast"])
    d = json.loads(capsys.readouterr().out)
    assert d["pixel"] == [8, 12]
    assert "slab_hit" in d and "steps" in d


def test_uv_carrying_and_interpolation():
    import jax.numpy as jnp

    from ray_tracer_tpu.models.scenes import serial_scene_config, build_scene

    scene = build_scene(serial_scene_config(8, 8))
    assert scene.uvs is not None and scene.uv_faces is not None
    assert scene.uv_faces.shape[0] == scene.faces.shape[0]
    uv = scene.interpolate_uv(
        jnp.array([0, 1]), jnp.array([0.25, 0.1]), jnp.array([0.25, 0.2])
    )
    assert uv.shape == (2, 2)
    assert np.isfinite(np.asarray(uv)).all()


def test_fit_command(capsys):
    cli.main(["fit", "--scene", "gradcheck", "--width", "16", "--steps", "5",
              "--trainable", "base_color,kd"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["last_loss"] <= rec["first_loss"]


def test_supersampling_spp2(tmp_path):
    """spp=2 renders and softens edges relative to spp=1."""
    a = str(tmp_path / "a.ppm")
    b = str(tmp_path / "b.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", a, "--fast"])
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", b, "--fast", "--spp", "2"])
    ia, ib = read_ppm(a).astype(int), read_ppm(b).astype(int)
    assert (ia != ib).any()  # edges differ
    # interiors agree: most pixels within 1 count
    assert (np.abs(ia - ib).max(axis=-1) <= 1).mean() > 0.7


def test_aov_command(tmp_path):
    out = str(tmp_path / "aovs.npz")
    cli.main(["aov", "--scene", "gradcheck", "--width", "16", "--out", out,
              "--fast"])
    data = np.load(out)
    assert data["depth"].shape == (16, 16)
    assert data["normal"].shape == (16, 16, 3)


def test_fit_command_with_feature_flags(tmp_path):
    """fit accepts the production shading flags (smooth normals, extra
    lights, env file) through the shared _build_cfg plumbing."""
    from ray_tracer_tpu.io.ppm import write_ppm

    env = str(tmp_path / "env.ppm")
    write_ppm(env, np.full((4, 8, 3), 40, np.uint8), already_u8=True)
    cli.main(["fit", "--scene", "gradcheck", "--width", "8", "--steps", "2",
              "--fast", "--smooth-normals", "--extra-light", "0,8,0,0.5",
              "--env-file", env, "--trainable", "base_color"])


def test_aov_sharded_and_ring_commands(tmp_path):
    """Round 5: `aov --devices N [--ring]` — sharded and ring AOV/AO
    export through the CLI, equal to the single-device buffers."""
    single = str(tmp_path / "aov1.npz")
    cli.main(["aov", "--scene", "gradcheck", "--width", "16", "--fast",
              "--ao-samples", "4", "--out", single])
    sharded = str(tmp_path / "aov8.npz")
    cli.main(["aov", "--scene", "gradcheck", "--width", "16", "--fast",
              "--ao-samples", "4", "--devices", "8", "--out", sharded])
    ring = str(tmp_path / "aovr.npz")
    cli.main(["aov", "--scene", "gradcheck", "--width", "16", "--fast",
              "--ao-samples", "4", "--devices", "8", "--ring",
              "--out", ring])
    a, s, g = (np.load(p) for p in (single, sharded, ring))
    for k in ("hit", "tri_id", "material_id"):
        np.testing.assert_array_equal(a[k], s[k], err_msg=k)
        np.testing.assert_array_equal(a[k], g[k], err_msg=k)
    np.testing.assert_array_equal(a["ao"], s["ao"])
    assert np.abs(a["ao"] - g["ao"]).max() <= 0.25 + 1e-6


def test_debug_ring_command(capsys):
    """`debug --devices N --ring` traces the pixel through ring orbits."""
    cli.main(["debug", "--scene", "gradcheck", "--x", "8", "--y", "8",
              "--fast"])
    single = json.loads(capsys.readouterr().out)
    cli.main(["debug", "--scene", "gradcheck", "--x", "8", "--y", "8",
              "--fast", "--devices", "8", "--ring"])
    ring = json.loads(capsys.readouterr().out)
    assert ring["hit"] == single["hit"]
    if single["hit"]:
        assert ring["tri_id"] == single["tri_id"]
        assert ring["in_shadow"] == single["in_shadow"]
        assert ring["steps"] == -1
