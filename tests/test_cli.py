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


def test_render_sharded_command(tmp_path):
    out = str(tmp_path / "img8.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", out, "--fast", "--devices", "8"])
    single = str(tmp_path / "img1.ppm")
    cli.main(["render", "--scene", "gradcheck", "--width", "16",
              "--out", single, "--fast"])
    np.testing.assert_array_equal(read_ppm(out), read_ppm(single))


def test_info_command(capsys):
    cli.main(["info"])
    info = json.loads(capsys.readouterr().out)
    assert len(info["devices"]) >= 8


def test_fit_command(capsys):
    cli.main(["fit", "--scene", "gradcheck", "--width", "16", "--steps", "5",
              "--trainable", "base_color,kd"])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["last_loss"] <= rec["first_loss"]
