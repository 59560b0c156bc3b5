"""GridConfig.exact_overlap: SAT triangle-box insertion filtering.

The reference inserts a triangle into every voxel overlapped by its
AABB (Serial/grid.h:118-150).  exact_overlap=True SAT-filters the
candidate pairs (accel/grid.tri_box_overlap) — a production knob that
must never change WHAT a render finds, only how many cells list each
triangle.
"""

import dataclasses

import numpy as np
import pytest

from ray_tracer_tpu.accel.grid import build_grid, tri_box_overlap
from ray_tracer_tpu.models.scenes import scene_numpy_arrays, serial_scene_config


def _cell_lists(g):
    cs = g.host.cell_start
    return [g.host.tri_ids[cs[i]:cs[i + 1]].tolist() for i in range(len(cs) - 1)]


@pytest.fixture(scope="module")
def spot_geometry():
    cfg = serial_scene_config(64, 64)
    verts, faces, *_ = scene_numpy_arrays(cfg)
    return verts, faces


def test_exact_is_subset_with_same_order(spot_geometry):
    verts, faces = spot_geometry
    g_aabb = build_grid(verts, faces, 2.0, 128, use_native=False)
    g_sat = build_grid(verts, faces, 2.0, 128, exact_overlap=True)
    assert g_sat.meta.nnz < g_aabb.meta.nnz  # it actually filters
    la, ls = _cell_lists(g_aabb), _cell_lists(g_sat)
    for a, s in zip(la, ls):
        # subset AND subsequence: within-cell order is preserved
        it = iter(a)
        assert all(t in it for t in s)


def test_every_vertex_cell_keeps_its_triangle(spot_geometry):
    """The cell containing a triangle vertex geometrically touches the
    triangle, so SAT must keep the pair — the property nearest-hit
    correctness rests on (any hit point's cell lists its triangle)."""
    verts, faces = spot_geometry
    g = build_grid(verts, faces, 2.0, 128, exact_overlap=True)
    host = g.host
    nx, ny, nz = g.meta.n_voxels
    nv = np.asarray([nx, ny, nz], np.int32)
    lists = _cell_lists(g)
    rng = np.random.default_rng(7)
    for f in rng.choice(faces.shape[0], size=200, replace=False):
        for v in faces[f]:
            p = verts[v]
            c = np.clip(
                np.trunc(((p - host.lower) * host.inv_width).astype(np.float32)
                         ).astype(np.int32),
                0, nv - 1,
            )
            lin = c[2] * (nx * ny) + c[1] * nx + c[0]
            assert int(f) in lists[lin], (f, v, c)


def test_diagonal_sliver_filtered():
    """A thin diagonal triangle overlaps far fewer cells than its AABB —
    the case the SAT filter exists for."""
    verts = np.asarray(
        [[0.05, 0.05, 0.05], [3.95, 3.95, 3.9], [3.95, 3.95, 3.95]],
        np.float32,
    )
    # pad the scene with a corner triangle so the grid spans [0,4]^3
    verts = np.concatenate([verts, np.asarray(
        [[0.0, 0.0, 0.0], [4.0, 0.0, 0.0], [0.0, 4.0, 4.0]], np.float32)])
    faces = np.asarray([[0, 1, 2], [3, 4, 5]], np.int32)
    g_aabb = build_grid(verts, faces, 4.0, 8, use_native=False)
    g_sat = build_grid(verts, faces, 4.0, 8, exact_overlap=True)
    ca = np.diff(g_aabb.host.cell_start)
    cs = np.diff(g_sat.host.cell_start)
    # the sliver's AABB covers ~the whole grid; exact overlap is ~diagonal
    count_a = int(np.sum([0 in l for l in _cell_lists(g_aabb)]))
    count_s = int(np.sum([0 in l for l in _cell_lists(g_sat)]))
    assert count_s < count_a / 4
    assert count_s >= 1
    assert ca.sum() > cs.sum()


def test_tri_box_overlap_axis_cases():
    v0 = np.asarray([[0.0, 0.0, 0.5]])
    v1 = np.asarray([[1.0, 0.0, 0.5]])
    v2 = np.asarray([[0.0, 1.0, 0.5]])
    lo = np.asarray([[0.0, 0.0, 0.0]])
    hi = np.asarray([[1.0, 1.0, 1.0]])
    pad = np.full((1, 3), 1e-9)
    # inside
    assert tri_box_overlap(v0, v1, v2, lo, hi, pad)[0]
    # triangle-plane separation: the diagonal plane x+y+z = 1.5 misses
    # the corner box [0, 0.3]^3 even though their AABBs overlap
    assert not tri_box_overlap(
        np.asarray([[1.5, 0.0, 0.0]]), np.asarray([[0.0, 1.5, 0.0]]),
        np.asarray([[0.0, 0.0, 1.5]]),
        np.asarray([[0.0, 0.0, 0.0]]), np.asarray([[0.3, 0.3, 0.3]]), pad,
    )[0]
    # touching exactly at a corner counts as overlap (inclusive)
    assert tri_box_overlap(
        np.asarray([[1.0, 1.0, 1.0]]), np.asarray([[2.0, 1.0, 1.0]]),
        np.asarray([[1.0, 2.0, 1.0]]), lo, hi, pad,
    )[0]
    # edge-cross separation: a flat triangle sliding diagonally past the
    # (1,1) corner in the z=0.5 plane — its AABB overlaps the box and
    # the z plane test passes, but the in-plane axis cross(z, edge)
    # separates (the whole triangle lies on x+y >= 2.2; the box tops
    # out at x+y = 2)
    assert not tri_box_overlap(
        np.asarray([[1.8, 0.4, 0.5]]), np.asarray([[0.4, 1.8, 0.5]]),
        np.asarray([[2.0, 2.0, 0.5]]), lo, hi, pad,
    )[0]


def test_native_exact_build_matches_numpy(spot_geometry):
    """The C++ builder's SAT filter (rtpu_grid_build_v2) keeps bitwise
    keep/drop parity with the numpy reference — same f64 operation
    order, lib compiled -ffp-contract=off."""
    from ray_tracer_tpu.accel import native

    if not native.available():
        pytest.skip("native library not built")
    verts, faces = spot_geometry
    a = build_grid(verts, faces, 2.0, 128, use_native=False,
                   exact_overlap=True)
    b = build_grid(verts, faces, 2.0, 128, use_native=True,
                   exact_overlap=True)
    assert a.meta == b.meta
    np.testing.assert_array_equal(a.host.cell_start, b.host.cell_start)
    np.testing.assert_array_equal(a.host.tri_ids, b.host.tri_ids)

    g = np.random.default_rng(5)
    rverts = g.normal(size=(200, 3)).astype(np.float32)
    rfaces = g.integers(0, 200, size=(150, 3)).astype(np.int32)
    a = build_grid(rverts, rfaces, use_native=False, exact_overlap=True)
    b = build_grid(rverts, rfaces, use_native=True, exact_overlap=True)
    assert a.meta == b.meta
    np.testing.assert_array_equal(a.host.cell_start, b.host.cell_start)
    np.testing.assert_array_equal(a.host.tri_ids, b.host.tri_ids)


def test_production_render_identical(spot_geometry):
    """The spot production render (persistent wave, packed grid) is
    bit-identical with and without exact insertion — the filter removes
    only tests that can never produce the nearest hit."""
    from ray_tracer_tpu.render.renderer import prepare, render

    base = serial_scene_config(96, 96)
    imgs = {}
    for exact in (False, True):
        cfg = dataclasses.replace(
            base,
            render=dataclasses.replace(
                base.render,
                faithful=False, det_dtype="float32",
                traversal="packed", scheduler="persistent",
                packed_block_tris=14, wave=2048, pump=2,
                grid_layout="auto",
                grid=dataclasses.replace(
                    base.render.grid,
                    resolution_multiplier=2.0, max_resolution=128,
                    exact_overlap=exact,
                ),
            ),
        )
        imgs[exact] = np.asarray(render(prepare(cfg)))
    np.testing.assert_array_equal(imgs[False], imgs[True])


def test_tiled_scheduler_render_identical(spot_geometry):
    from ray_tracer_tpu.render.renderer import prepare, render

    base = serial_scene_config(64, 64)
    imgs = {}
    for exact in (False, True):
        cfg = dataclasses.replace(
            base,
            render=dataclasses.replace(
                base.render,
                faithful=False, det_dtype="float32",
                traversal="packed", scheduler="tiled", ray_tile=512,
                grid=dataclasses.replace(
                    base.render.grid, exact_overlap=exact,
                ),
            ),
        )
        imgs[exact] = np.asarray(render(prepare(cfg)))
    np.testing.assert_array_equal(imgs[False], imgs[True])
