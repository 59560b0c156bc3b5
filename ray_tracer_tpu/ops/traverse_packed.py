"""Production traversal: stateless DDA over the block-packed grid.

TPU-first redesign of the voxel walk (reference: Serial/grid.h:167-231).
The CSR walk in ops/traverse.py is the faithful oracle-parity path; this
one is built around the measured hardware constraint that a random HBM
gather costs ~one row per ray regardless of width (128 lanes max), so
each live ray pays exactly two gathered rows per step:

  1. `cell_info[cell]` — a packed uint32 with the voxel's block range
     and its Chebyshev distance to the nearest occupied voxel;
  2. `blocks[row]` — one block row (meta.block_tris whole triangles,
     56 in the tuned production config) tested in a single fused VPU
     sweep.

March structure (all lanes in lock-step, predicated):

  * a lane NOT mid-voxel probes the point t_cur + delta, decodes its
    cell, and either (a) starts testing the cell's block rows, or
    (b) leaps the empty Chebyshev-safe box in one step — empty-sky
    rays cross a 64-cell grid in a handful of steps instead of ~180,
    which matters because a SIMD wave retires at its slowest lane;
  * a lane mid-voxel tests one block row per step, recording the
    nearest accepted hit as (block, slot);
  * a lane dies when its next cell entry lies beyond min(maxt, best_t)
    (early exit) or, for occlusion queries, on any accepted hit.

The winning triangle id is resolved AFTER the march with one gather
from `slot_tri` — ids never ride through the loop.

Not bit-faithful to the serial reference (different visit order for
equal-t ties across voxels, probe nudge can skip sub-1e-3-width cell
slivers); renders match the oracle to boundary-pixel tolerance and the
brute-force sweep exactly on the test scenes.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ray_tracer_tpu.accel.packed import (
    PackedGridArrays,
    PackedGridMeta,
    decode_cell_info,
)
from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.intersect import cramer_tbg


class PackedTraceResult(NamedTuple):
    any_pass: jnp.ndarray  # == hit (production path has no faithful any_pass)
    hit: jnp.ndarray  # (R,) bool
    t: jnp.ndarray  # (R,) f32
    tri_id: jnp.ndarray  # (R,) i32, -1 on miss
    steps: jnp.ndarray  # (R,) i32


@partial(
    jax.jit,
    static_argnames=("meta", "t_gate", "stop_on_first_hit", "max_steps", "unroll"),
)
def traverse_packed(
    rays: RayBatch,
    grid: PackedGridArrays,
    meta: PackedGridMeta,
    *,
    t_gate: float = 0.0,
    stop_on_first_hit: bool = False,
    max_steps: Optional[int] = None,
    unroll: int = 1,
) -> PackedTraceResult:
    nx, ny, nz = meta.n_voxels
    nvox = jnp.asarray([nx, ny, nz], jnp.int32)
    n_blocks = meta.n_blocks
    bt = meta.block_tris
    delta = jnp.float32(meta.probe_delta)
    if max_steps is None:
        # cells on the longest axis-path plus one block row per packed row
        max_steps = 4 * (nx + ny + nz) + 64

    # the packed path is f32 by contract; coerce so x64-mode callers
    # (tests, notebooks) don't promote the while_loop carry dtypes
    o = rays.orig.astype(jnp.float32)
    d = rays.dirn.astype(jnp.float32)
    mint = rays.mint.astype(jnp.float32)
    maxt = rays.maxt.astype(jnp.float32)
    r = rays.count
    inf = jnp.float32(jnp.inf)
    invd = 1.0 / d  # +/-inf on axis-parallel rays; IEEE max/min below is fine

    # grid entry (slab), as in the faithful path
    t_near = (grid.lower - o) * invd
    t_far = (grid.upper - o) * invd
    lo = jnp.minimum(t_near, t_far)
    hi = jnp.maximum(t_near, t_far)
    t0 = jnp.maximum(jnp.max(lo, axis=-1), mint)
    t1 = jnp.minimum(jnp.min(hi, axis=-1), maxt)
    entered = t0 <= t1

    zf = jnp.where(jnp.isfinite(o[:, 0]), 0.0, 0.0).astype(jnp.float32)
    zi = zf.astype(jnp.int32)
    zb = zi != 0

    state = dict(
        alive=entered & jnp.isfinite(t0),
        testing=zb,
        t_cur=t0,
        t_exit_cell=zf,
        first_blk=zi,
        n_blk=zi,
        cursor=zi,
        best_t=zf + inf,
        best_blk=zi,
        best_slot=zi,
        steps=zi,
        i=jnp.asarray(0, jnp.int32),
    )

    max_iters = -(-max_steps // unroll)

    def cond(s):
        return (s["i"] < max_iters) & jnp.any(s["alive"])

    def cell_phase(s):
        """Probe + cell_info fetch for lanes not mid-voxel."""
        alive, testing, t_cur = s["alive"], s["testing"], s["t_cur"]
        probe = t_cur + delta
        p = o + d * probe[:, None]
        cellf = (p - grid.lower) * grid.inv_width
        cell = jnp.floor(cellf).astype(jnp.int32)  # (R,3)
        inside = jnp.all((cell >= 0) & (cell < nvox), axis=-1)
        fetch = alive & ~testing
        die = fetch & ~inside

        cc = jnp.clip(cell, 0, nvox - 1)
        lin = cc[:, 2] * (nx * ny) + cc[:, 1] * nx + cc[:, 0]
        info = grid.cell_info[lin]  # GATHER 1: (R,) uint32
        first, nblk, dist = decode_cell_info(info)
        occupied = nblk > 0

        # safe-box exit: radius 1 for occupied cells, Chebyshev dist for empty
        rad = jnp.where(occupied, 1, jnp.maximum(dist, 1))[:, None]
        blo = grid.lower + (cell - (rad - 1)).astype(jnp.float32) * grid.width
        bhi = grid.lower + (cell + rad).astype(jnp.float32) * grid.width
        tf = jnp.maximum((blo - o) * invd, (bhi - o) * invd)
        t_exit = jnp.maximum(jnp.min(tf, axis=-1), probe)  # monotone progress

        start_test = fetch & inside & occupied
        jump = fetch & inside & ~occupied
        return dict(
            s,
            first_blk=jnp.where(start_test, first, s["first_blk"]),
            n_blk=jnp.where(start_test, nblk, s["n_blk"]),
            cursor=jnp.where(start_test, 0, s["cursor"]),
            t_exit_cell=jnp.where(start_test, t_exit, s["t_exit_cell"]),
            t_cur=jnp.where(jump, t_exit, t_cur),
            testing=testing | start_test,
            alive=alive & ~die,
        )

    def block_phase(s):
        """Test one block row (meta.block_tris triangles) for lanes mid-voxel."""
        testing = s["testing"]
        blk = jnp.clip(s["first_blk"] + s["cursor"], 0, n_blocks - 1)
        row = grid.blocks[blk]  # GATHER 2: (R, row_lanes) f32
        tri = row[:, : bt * 9].reshape(r, bt, 9)
        t, beta, gamma = cramer_tbg(
            o[:, None, :], d[:, None, :],
            tri[..., 0:3], tri[..., 3:6], tri[..., 6:9],
            det_dtype=jnp.float32,
        )
        accept = (
            (beta > 0) & (gamma > 0) & (beta + gamma < 1)
            & (t > t_gate) & testing[:, None]
        )
        tm = jnp.where(accept, t, inf)
        slot = jnp.argmin(tm, axis=-1).astype(jnp.int32)
        m = jnp.take_along_axis(tm, slot[:, None], axis=-1)[:, 0]
        upd = m < s["best_t"]

        cursor = jnp.where(testing, s["cursor"] + 1, s["cursor"])
        done = testing & (cursor >= s["n_blk"])
        return dict(
            s,
            best_t=jnp.where(upd, m, s["best_t"]),
            best_blk=jnp.where(upd, blk, s["best_blk"]),
            best_slot=jnp.where(upd, slot, s["best_slot"]),
            cursor=cursor,
            t_cur=jnp.where(done, s["t_exit_cell"], s["t_cur"]),
            testing=testing & ~done,
        )

    def body(s):
        # Both phases run unconditionally; predication by masks.  (A
        # lax.cond phase-skip variant measured SLOWER — the per-iteration
        # any() reductions and branch overhead exceed the skipped-gather
        # savings at production tile sizes.)  `unroll` march steps per
        # while iteration amortize the loop-control overhead that
        # dominates at small tiles.
        for _ in range(unroll):
            s = cell_phase(s)
            s = block_phase(s)

            limit = jnp.minimum(maxt, s["best_t"])
            alive = s["alive"] & (s["testing"] | (s["t_cur"] <= limit))
            if stop_on_first_hit:
                alive = alive & ~jnp.isfinite(s["best_t"])
            s = dict(
                s,
                alive=alive,
                steps=s["steps"] + s["alive"].astype(jnp.int32),
            )
        return dict(s, i=s["i"] + 1)

    out = jax.lax.while_loop(cond, body, state)
    hit = jnp.isfinite(out["best_t"])
    slot_idx = jnp.clip(
        out["best_blk"] * bt + out["best_slot"], 0,
        grid.slot_tri.shape[0] - 1,
    )
    tri_id = jnp.where(hit, grid.slot_tri[slot_idx], -1)
    return PackedTraceResult(
        any_pass=hit, hit=hit, t=out["best_t"], tri_id=tri_id, steps=out["steps"]
    )
