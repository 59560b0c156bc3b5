"""Uniform-grid build: resolution heuristic, CSR invariants, native parity.

Reference: Serial/grid.h:79-153 (build), 94-101 (resolution), 73-75
(z-major index); CUDA two-pass build Parallel/grid.cuh:137-207.
"""

import numpy as np
import pytest

from ray_tracer_tpu.accel import native
from ray_tracer_tpu.accel.grid import build_grid, grid_resolution, pos_to_voxel
from ray_tracer_tpu.models.scenes import serial_scene_config, build_scene


def test_resolution_heuristic_serial_scene():
    """The serial reference scene (spot+blub, 20,064 tris) must produce the
    oracle's 64x50x64 grid."""
    cfg = serial_scene_config(16, 16)
    scene = build_scene(cfg)
    grid = build_grid(np.asarray(scene.verts), np.asarray(scene.faces))
    assert grid.meta.n_voxels == (64, 50, 64)
    assert grid.meta.nnz == 101854  # matches oracle's printed entry count


def test_resolution_clamps():
    lower = np.zeros(3, np.float32)
    upper = np.array([100.0, 1e-9, 0.5], np.float32)
    n = grid_resolution(lower, upper, num_tris=1_000_000, max_resolution=64)
    assert n.max() <= 64 and n.min() >= 1


def test_csr_covers_every_triangle_aabb():
    """Every triangle must appear in every voxel its AABB overlaps."""
    g = np.random.default_rng(11)
    verts = g.normal(size=(60, 3)).astype(np.float32)
    faces = g.integers(0, 60, size=(40, 3)).astype(np.int32)
    grid = build_grid(verts, faces, use_native=False)
    nx, ny, nz = grid.meta.n_voxels
    cs = np.asarray(grid.arrays.cell_start)
    ids = np.asarray(grid.arrays.tri_ids)
    lower = np.asarray(grid.arrays.lower)
    inv_w = np.asarray(grid.arrays.inv_width)
    nvox = np.asarray(grid.meta.n_voxels, np.int32)

    v = verts[faces]  # (F,3,3)
    lo, hi = v.min(axis=1), v.max(axis=1)
    vmin = pos_to_voxel(lo, lower, inv_w, nvox)
    vmax = pos_to_voxel(hi, lower, inv_w, nvox)
    for f in range(faces.shape[0]):
        for z in range(vmin[f, 2], vmax[f, 2] + 1):
            for y in range(vmin[f, 1], vmax[f, 1] + 1):
                for x in range(vmin[f, 0], vmax[f, 0] + 1):
                    cell = z * nx * ny + y * nx + x
                    assert f in ids[cs[cell]:cs[cell + 1]], (f, x, y, z)


def test_within_cell_order_is_ascending_triangle_id():
    """Insertion order == ascending id (grid.h:135-148 loop order) — required
    for oracle-faithful tie-breaking."""
    g = np.random.default_rng(3)
    verts = g.normal(size=(90, 3)).astype(np.float32)
    faces = g.integers(0, 90, size=(64, 3)).astype(np.int32)
    grid = build_grid(verts, faces, use_native=False)
    cs = np.asarray(grid.arrays.cell_start)
    ids = np.asarray(grid.arrays.tri_ids)
    for c in range(len(cs) - 1):
        seg = ids[cs[c]:cs[c + 1]]
        assert (np.diff(seg) > 0).all(), c


@pytest.mark.skipif(not native.available(), reason="native library not built")
def test_native_build_matches_numpy():
    g = np.random.default_rng(5)
    verts = g.normal(size=(200, 3)).astype(np.float32)
    faces = g.integers(0, 200, size=(150, 3)).astype(np.int32)
    a = build_grid(verts, faces, use_native=False)
    b = build_grid(verts, faces, use_native=True)
    assert a.meta == b.meta
    np.testing.assert_array_equal(np.asarray(a.arrays.cell_start), np.asarray(b.arrays.cell_start))
    np.testing.assert_array_equal(np.asarray(a.arrays.tri_ids), np.asarray(b.arrays.tri_ids))
    np.testing.assert_array_equal(np.asarray(a.arrays.lower), np.asarray(b.arrays.lower))
    np.testing.assert_array_equal(np.asarray(a.arrays.width), np.asarray(b.arrays.width))


def test_build_grid_zero_faces():
    """An empty shard/selection builds a valid empty grid, not a crash."""
    from ray_tracer_tpu.accel.grid import build_grid

    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    g = build_grid(verts, np.zeros((0, 3), np.int32))
    assert g.meta.nnz == 0
    assert g.meta.n_voxels == (1, 1, 1)
    assert g.host.tri_ids.shape == (0,)


def test_build_grid_fully_degenerate_mesh():
    """All referenced points identical: the reference's resolution
    formula divides by zero; we define it as a 1-cell grid (both
    builders), instead of NaN -> int UB."""
    from ray_tracer_tpu.accel.grid import build_grid

    verts = np.zeros((3, 3), np.float32)
    faces = np.array([[0, 1, 2]], np.int32)
    for use_native in (False, True):
        g = build_grid(verts, faces, use_native=use_native)
        assert g.meta.n_voxels == (1, 1, 1), use_native
        assert g.meta.nnz == 1


def test_host_geometry_cache_invalidates_on_faces_replace():
    """scene._replace(faces=...) keeps the verts object; the host
    mirror must not serve the stale face list to the grid builder."""
    import jax.numpy as jnp
    import numpy as np

    from ray_tracer_tpu.models.scenes import gradcheck_scene, host_geometry

    scene, _ = gradcheck_scene(8, 8)
    v0, f0 = host_geometry(scene)
    culled = scene._replace(
        faces=scene.faces[: scene.num_faces // 2],
        face_material=scene.face_material[: scene.num_faces // 2],
    )
    v1, f1 = host_geometry(culled)
    assert f1.shape[0] == culled.num_faces != f0.shape[0]
    np.testing.assert_array_equal(v1, np.asarray(culled.verts))
