"""OBJ parsing (vs reference load_mesh semantics) and PPM round-trip."""

import os

import numpy as np
import pytest

from ray_tracer_tpu.accel import native
from ray_tracer_tpu.io.obj import load_obj, _parse_obj_numpy
from ray_tracer_tpu.io.ppm import read_ppm, tonemap_u8, write_ppm

OBJ_TEXT = """# comment
v 0.0 0.0 0.0
v 1.0 0.0 0.0
v 0.0 1.0 0.5
vt 0.25 0.75
f 1/1 2/1 3/1
"""


@pytest.fixture
def obj_file(tmp_path):
    p = tmp_path / "tri.obj"
    p.write_text(OBJ_TEXT)
    return str(p)


def test_parse_basic(obj_file):
    mesh = load_obj(obj_file, use_native=False)
    assert mesh.verts.shape == (3, 3) and mesh.faces.shape == (1, 3)
    np.testing.assert_array_equal(mesh.faces[0], [0, 1, 2])  # 1-based -> 0-based
    np.testing.assert_allclose(mesh.uvs[0], [0.25, 0.75])


def test_offset_scale_transform(obj_file):
    """scale * (coord + offset) in f64 then f32 (Parallel/raytracer.cu:824)."""
    mesh = load_obj(obj_file, offset=(1.0, 2.0, 3.0), scale=2.0, use_native=False)
    np.testing.assert_allclose(mesh.verts[0], [2.0, 4.0, 6.0])
    np.testing.assert_allclose(mesh.verts[2], [2.0, 6.0, 7.0])


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_parser_matches_numpy(obj_file):
    a = load_obj(obj_file, use_native=False)
    b = load_obj(obj_file, use_native=True)
    np.testing.assert_array_equal(a.verts, b.verts)
    np.testing.assert_array_equal(a.faces, b.faces)


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_parser_matches_numpy_on_assets():
    from ray_tracer_tpu.models.scenes import asset

    for name in ("spot_triangulated.obj", "plane.obj"):
        a = load_obj(asset(name), use_native=False)
        b = load_obj(asset(name), use_native=True)
        np.testing.assert_array_equal(a.verts, b.verts)
        np.testing.assert_array_equal(a.faces, b.faces)


def test_tonemap_clamp_truncates():
    """min(1, c/255)*255 with C truncation (Serial/raytracer.cpp:178-185)."""
    img = np.array([[[254.7, 255.0, 300.0]]], np.float32)
    out = tonemap_u8(img)
    assert out[0, 0, 0] == 254  # truncation, not rounding
    assert out[0, 0, 1] == 255
    assert out[0, 0, 2] == 255  # clamped


def test_ppm_roundtrip(tmp_path):
    g = np.random.default_rng(0)
    img = g.integers(0, 256, size=(5, 7, 3)).astype(np.uint8)
    p = str(tmp_path / "x.ppm")
    write_ppm(p, img, already_u8=True)
    np.testing.assert_array_equal(read_ppm(p), img)


def test_png_roundtrip(tmp_path):
    from ray_tracer_tpu.io.png import read_png, write_png

    g = np.random.default_rng(1)
    img = g.integers(0, 256, size=(6, 9, 3)).astype(np.uint8)
    p = str(tmp_path / "x.png")
    write_png(p, img, already_u8=True)
    np.testing.assert_array_equal(read_png(p), img)
    # both writers share tonemap_u8: identical pixel bytes
    f = g.uniform(0, 300, size=(4, 5, 3)).astype(np.float32)
    write_png(p, f)
    np.testing.assert_array_equal(read_png(p), tonemap_u8(f))


def test_png_reader_rejects_interlaced(tmp_path):
    import struct
    import zlib

    from ray_tracer_tpu.io.png import read_png

    def chunk(tag, data):
        return (struct.pack(">I", len(data)) + tag + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

    # minimal header claiming Adam7 interlacing (interlace byte = 1)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1)
    p = str(tmp_path / "i.png")
    with open(p, "wb") as fh:
        fh.write(b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                 + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
                 + chunk(b"IEND", b""))
    import pytest

    with pytest.raises(ValueError, match="interlaced"):
        read_png(p)


def test_png_reader_on_external_files():
    """The reader handles third-party PNGs (filtered rows), not just our
    own filter-0 output: the README sample images."""
    import os

    from ray_tracer_tpu.io.png import read_png

    path = os.path.join(
        os.path.dirname(__file__), "..", "docs", "images",
        "serial_scene_512.png",
    )
    img = read_png(path)
    assert img.shape == (512, 512, 3)
    assert img.max() > 0


def test_plane_generator_matches_reference_counts():
    """plane_mesh_creator.py emits 10,404 verts / 20,402 faces (SURVEY #23);
    the reference's count includes 202 degenerate closing faces we don't
    emit — ours is the exact 2*(10*10)^2 = 20,000-face grid plus none."""
    from ray_tracer_tpu.models.meshes import make_plane

    mesh = make_plane(extent=10.0, y=-1.0, density=10)
    assert mesh.verts.shape[0] == 101 * 101
    assert mesh.faces.shape[0] == 2 * 100 * 100
    assert np.allclose(mesh.verts[:, 1], -1.0)


def test_partially_textured_obj_uv_alignment(tmp_path):
    """Faces without vt must keep uv_faces index-aligned with faces
    (-1 rows), matching the native loader's -1-if-absent convention —
    a vt-less face between textured ones must not shift later rows."""
    p = tmp_path / "mix.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
        "vt 0.25 0.75\nvt 0.5 0.5\nvt 1 0\n"
        "f 1 2 3\n"            # no vt
        "f 2/1 4/2 3/3\n"      # textured
    )
    from ray_tracer_tpu.io.obj import load_obj

    for use_native in (False, None):
        m = load_obj(str(p), use_native=use_native)
        assert m.faces.shape == (2, 3)
        assert m.uv_faces.shape == (2, 3), m.uv_faces
        assert (m.uv_faces[0] == -1).all()
        np.testing.assert_array_equal(m.uv_faces[1], [0, 1, 2])

    # concat keeps -1 rows unshifted (a valid-looking index after
    # +uvoffset would silently sample another mesh's uvs)
    from ray_tracer_tpu.models.scenes import concat_mesh_arrays

    m = load_obj(str(p), use_native=False)
    _, faces, _, uvs, uvf = concat_mesh_arrays([(m, 0), (m, 1)])
    assert faces.shape == (4, 3)
    assert (uvf[0] == -1).all() and (uvf[2] == -1).all()
    np.testing.assert_array_equal(uvf[1], [0, 1, 2])
    np.testing.assert_array_equal(uvf[3], [3, 4, 5])


def test_mixed_vt_face_marks_whole_row_untextured(tmp_path):
    """A face with vt on only SOME corners ('f 1/1 2 3') is untextured
    as a whole: per-corner -1 would pass the renderer's face-level
    has_uv check and gather garbage uvs.  Native and numpy parsers must
    agree."""
    p = tmp_path / "partial.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "vt 0.25 0.75\n"
        "f 1/1 2 3\n"
    )
    from ray_tracer_tpu.io.obj import load_obj

    for use_native in (False, None):
        m = load_obj(str(p), use_native=use_native)
        assert m.faces.shape == (1, 3)
        if m.uv_faces.size:  # all-(-1) table may be dropped entirely
            assert (m.uv_faces == -1).all(), (use_native, m.uv_faces)


def test_relative_obj_indices(tmp_path):
    """OBJ negative indices are relative to the elements defined so far
    (-1 = most recent); both parsers resolve them identically."""
    p = tmp_path / "rel.obj"
    p.write_text(
        "v 0 0 0\nv 1 0 0\nv 0 1 0\n"
        "f -3 -2 -1\n"
        "v 2 2 0\n"
        "f 1 2 -1\n"
    )
    from ray_tracer_tpu.io.obj import load_obj

    for use_native in (False, None):
        m = load_obj(str(p), use_native=use_native)
        np.testing.assert_array_equal(
            m.faces, [[0, 1, 2], [0, 1, 3]], err_msg=str(use_native)
        )


def test_tab_separated_face_parses_like_numpy(tmp_path):
    """strtol must not skip whitespace into the NEXT corner's token:
    tab-separated corners with trailing slashes parse identically in
    the native and numpy loaders."""
    p = str(tmp_path / "tabs.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\n")
        fh.write("f 1/\t2/\t3/\n")
    a = load_obj(p, use_native=False)
    np.testing.assert_array_equal(a.faces, [[0, 1, 2]])
    from ray_tracer_tpu.accel import native

    if native.available():
        b = load_obj(p, use_native=True)
        np.testing.assert_array_equal(b.faces, a.faces)
        np.testing.assert_array_equal(b.uv_faces, a.uv_faces)


def test_vt_index_zero_is_untextured(tmp_path):
    """An explicit vt index of 0 is invalid OBJ: both parsers treat the
    face as untextured instead of pointing past the uv table."""
    p = str(tmp_path / "vt0.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0 0\n")
        fh.write("f 1/0 2/0 3/0\n")
    a = load_obj(p, use_native=False)
    assert a.uv_faces.size == 0 and a.uvs.size == 0  # dropped as untextured
    from ray_tracer_tpu.accel import native

    if native.available():
        b = load_obj(p, use_native=True)
        assert b.uv_faces.size == 0 and b.uvs.size == 0


def test_untextured_mesh_drops_both_uv_tables(tmp_path):
    """vt lines with no textured faces: both parsers return EMPTY uvs
    AND uv_faces (consumers branch on .size)."""
    p = str(tmp_path / "unused_vt.obj")
    with open(p, "w") as fh:
        fh.write("v 0 0 0\nv 1 0 0\nv 0 1 0\nvt 0.5 0.5\n")
        fh.write("f 1 2 3\n")
    a = load_obj(p, use_native=False)
    assert a.uvs.shape == (0, 2) and a.uv_faces.shape == (0, 3)
    from ray_tracer_tpu.accel import native

    if native.available():
        b = load_obj(p, use_native=True)
        assert b.uvs.shape == (0, 2) and b.uv_faces.shape == (0, 3)


def test_native_available_survives_prebuild_probe(tmp_path, monkeypatch):
    """ensure_built() clears the failed-probe latch so the library
    becomes usable in-process once it exists."""
    from ray_tracer_tpu.accel import native

    if not native.available():
        import pytest

        pytest.skip("native library not built")
    # simulate a probe that latched failure before the build
    monkeypatch.setattr(native, "_lib", None)
    monkeypatch.setattr(native, "_lib_failed", True)
    assert native.ensure_built() is True
    assert native.available() is True
