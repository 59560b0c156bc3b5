"""Pin the re-hosted oracle to the REAL reference build.

Every golden test in this suite compares against `native/build/oracle`
— a re-hosted implementation of the serial reference.  If oracle.cc
ever drifted from /root/reference/Serial/raytracer.cpp:191-200
semantics, all those "bit-faithful" claims would silently degrade to
self-consistency.  This test is the anchor: it compiles the ACTUAL
reference source (read-only mount, build in tmp), runs it on its
hard-coded scene (spot + blub at 512x512, Serial/raytracer.cpp:191-200),
and byte-compares its test.ppm against the oracle's output on the same
scene at the same size.
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ray_tracer_tpu.io.ppm import read_ppm
from ray_tracer_tpu.models.scenes import asset

REFERENCE_DIR = "/root/reference/Serial"
SOURCES = ["raytracer.cpp", "geometry.h", "grid.h"]


@pytest.fixture(scope="module")
def reference_binary(tmp_path_factory):
    """g++ -O3 build of the untouched reference source in a tmp dir."""
    if not os.path.isdir(REFERENCE_DIR):
        pytest.skip("reference checkout not present on this host")
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    d = tmp_path_factory.mktemp("reference_build")
    for name in SOURCES:
        src = os.path.join(REFERENCE_DIR, name)
        if not os.path.exists(src):
            pytest.skip(f"reference source {name} missing")
        shutil.copy(src, d / name)
    # Serial/Makefile:6-9 flags; -mssse3 -malign-double affect only
    # codegen, kept anyway so the binary matches the reference's own
    # `make cpu` build exactly.
    subprocess.run(
        ["g++", "-O3", "-mssse3", "-malign-double",
         "-o", str(d / "ray_tracer"), str(d / "raytracer.cpp")],
        check=True, capture_output=True, timeout=300,
    )
    return d


def test_oracle_byte_identical_to_real_reference(reference_binary, oracle_bin):
    d = reference_binary
    # the reference loads its meshes from the cwd by bare filename
    # (Serial/raytracer.cpp:195-196) and writes test.ppm there
    for mesh in ("spot_triangulated.obj", "blub_triangulated.obj"):
        target = d / mesh
        if not target.exists():
            os.symlink(asset(mesh), target)
    subprocess.run(
        [str(d / "ray_tracer")], cwd=d, check=True,
        capture_output=True, timeout=600,
    )
    ref_img = read_ppm(str(d / "test.ppm"))
    assert ref_img.shape == (512, 512, 3)  # raytracer.cpp:128

    out = str(d / "oracle.ppm")
    subprocess.run(
        [
            oracle_bin, "--width", "512", "--height", "512", "--out", out,
            "--mesh", asset("spot_triangulated.obj"),
            "--mesh", asset("blub_triangulated.obj") + ":1.5,0,0",
        ],
        check=True, capture_output=True, timeout=600,
    )
    oracle_img = read_ppm(out)
    mismatches = int((ref_img != oracle_img).sum())
    assert mismatches == 0, (
        f"oracle drifted from the real reference: {mismatches} byte mismatches"
    )
    # belt-and-braces: the raw files must agree too (same P6 header form)
    with open(d / "test.ppm", "rb") as fh:
        ref_bytes = fh.read()
    with open(out, "rb") as fh:
        oracle_bytes = fh.read()
    assert np.frombuffer(ref_bytes[-512 * 512 * 3:], np.uint8).tobytes() == \
        np.frombuffer(oracle_bytes[-512 * 512 * 3:], np.uint8).tobytes()
