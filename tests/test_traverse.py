"""Grid DDA traversal vs brute-force all-pairs ground truth.

The traversal (ops/traverse.py, mirroring Serial/grid.h:167-231) must
find exactly the nearest hit the exhaustive sweep finds, in every eps
regime, with and without early exit.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.intersect import intersect_brute
from ray_tracer_tpu.ops.traverse import traverse_grid


def _camera_rays(prep, n=96, seed=4):
    rays = camera_rays(prep.cfg.camera)
    g = np.random.default_rng(seed)
    pick = g.choice(rays.count, size=n, replace=False)
    return RayBatch(*(np.asarray(x)[pick] if x.ndim else x for x in rays))


@pytest.mark.parametrize("early_exit", [False, True])
def test_traversal_matches_brute_force(tiny_prep, early_exit):
    prep = tiny_prep
    v0, v1, v2 = prep.scene.triangle_soa()
    rays = _camera_rays(prep)
    got = traverse_grid(
        rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2,
        t_gate=1e-4, early_exit=early_exit,
    )
    want = intersect_brute(rays, v0, v1, v2, t_lower=1e-4)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(want.hit))
    h = np.asarray(want.hit)
    np.testing.assert_array_equal(np.asarray(got.tri_id)[h], np.asarray(want.tri_id)[h])
    np.testing.assert_allclose(np.asarray(got.t)[h], np.asarray(want.t)[h], rtol=1e-6)


def test_unrestricted_regime_accepts_negative_t(tiny_prep):
    """A triangle in a VISITED voxel that lies behind the ray origin is
    still recorded when t_gate is None (Serial/geometry.h:164-171: the
    update has no lower bound; the walk itself is forward-only)."""
    prep = tiny_prep
    v0, v1, v2 = prep.scene.triangle_soa()
    # Origin just above the ground plane (y=-1), inside the bottom voxel
    # layer, moving straight UP: the plane triangles share the origin's
    # voxel but sit at t = -0.1 behind it.
    rays = RayBatch.make(
        jnp.array([[3.1, -0.9, 3.2]]), jnp.array([[0.0, 1.0, 0.0]])
    )
    res_none = traverse_grid(rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2, t_gate=None)
    res_gate = traverse_grid(rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2, t_gate=0.0)
    assert bool(res_none.hit[0]) and float(res_none.t[0]) < 0
    assert not bool(res_gate.hit[0])


def test_rays_missing_grid_die_immediately(tiny_prep):
    prep = tiny_prep
    v0, v1, v2 = prep.scene.triangle_soa()
    rays = RayBatch.make(
        jnp.array([[100.0, 100.0, 100.0], [jnp.inf, 0.0, 0.0]]),
        jnp.array([[0.0, 1.0, 0.0], [0.0, 1.0, 0.0]]),
    )
    res = traverse_grid(rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2, t_gate=0.0)
    assert not np.asarray(res.hit).any()
    assert (np.asarray(res.steps) == 0).all()


def test_stop_on_first_hit_agrees_on_hit_bit(tiny_prep):
    """Shadow-style occlusion query: the hit BIT must match the full walk."""
    prep = tiny_prep
    v0, v1, v2 = prep.scene.triangle_soa()
    rays = _camera_rays(prep, n=64, seed=9)
    fast = traverse_grid(
        rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2,
        t_gate=1e-4, early_exit=True, stop_on_first_hit=True,
    )
    full = traverse_grid(
        rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2, t_gate=1e-4,
    )
    np.testing.assert_array_equal(np.asarray(fast.hit), np.asarray(full.hit))


def test_traverse_empty_mesh_is_all_miss():
    """build_grid supports 0 faces; the trace must too (the gathers
    would otherwise fail on a zero-length axis)."""
    import jax.numpy as jnp

    from ray_tracer_tpu.accel.grid import build_grid
    from ray_tracer_tpu.core.rays import RayBatch

    g = build_grid(np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32))
    rays = RayBatch.make(jnp.zeros((4, 3)), jnp.ones((4, 3)))
    e = jnp.zeros((0, 3), jnp.float32)
    res = traverse_grid(rays, g.arrays, g.meta, e, e, e, t_gate=None)
    assert not np.asarray(res.hit).any()
    assert not np.asarray(res.any_pass).any()
    np.testing.assert_array_equal(np.asarray(res.tri_id), -1)
