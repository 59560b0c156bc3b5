"""Block-packed uniform grid — the TPU production layout.

Measured TPU gather cost is per ROW (~0.2-0.6 ms per 65k random rows,
independent of row width up to 128 lanes; see bench notes in
.claude/skills/verify/SKILL.md).  The CSR layout (accel/grid.py) pays
one row per (ray, triangle-slot) — dozens of rows per ray per voxel.
This layout pays ~2 rows per ray per voxel step:

  * `blocks` (n_blocks, 128) f32 — each row packs BLOCK_TRIS=14 whole
    triangles (14 x 9 = 126 floats, slot-major [v0 v1 v2]); a voxel's
    triangle list is ceil(count/14) consecutive rows.  Padding slots are
    all-zero degenerate triangles whose zero determinant fails the
    strict barycentric test (Serial/geometry.h:162) automatically.
  * `cell_info` (n_cells,) uint32 — per-voxel record packed as
    [dist:5 | n_blocks:6 | first_block:21]:
      - first_block: row of the voxel's first triangle block;
      - n_blocks: number of rows (0 = empty voxel);
      - dist: Chebyshev distance to the nearest non-empty voxel
        (0 for occupied), capped at 31 — the safe leap radius for
        empty-space skipping in the traversal.
  * `slot_tri` (n_blocks * BLOCK_TRIS,) i32 — global triangle id per
    (block, slot); fetched ONCE per ray after the march to resolve the
    winning hit (material index + differentiable vertex re-gather).

The reference's voxel lists (Serial/grid.h:17, Parallel/grid.cuh:26-28)
map to `blocks`; the distance field has no reference counterpart — it
exists because a lock-step SIMD march pays for its slowest lane, so
empty-sky rays must cross the grid in O(few) steps, not O(resolution).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.accel.grid import UniformGrid

BLOCK_TRIS = 14  # default: 14 triangles * 9 floats = 126 of 128 lanes
DIST_CAP = 31

_FIRST_BITS = 21
_NBLK_BITS = 6
_NBLK_SHIFT = _FIRST_BITS
_DIST_SHIFT = _FIRST_BITS + _NBLK_BITS
_FIRST_MASK = (1 << _FIRST_BITS) - 1
_NBLK_MASK = (1 << _NBLK_BITS) - 1


class PackedGridMeta(NamedTuple):
    n_voxels: Tuple[int, int, int]
    n_blocks: int
    probe_delta: float  # robust cell-probe nudge, in t units (dirs are unit)
    block_tris: int = BLOCK_TRIS  # triangles per block row
    row_lanes: int = 128  # block row width (multiple of 128)
    max_blocks: int = 1  # largest per-voxel block count (march bound)
    # inline layout: the cell header (overflow row, row count, Chebyshev
    # dist) lives IN the last two lanes of each cell's first block row,
    # so a march step issues ONE gather instead of two (cell_info +
    # block row).  The gather engine is issue-bound per index
    # (tools/fused_row_bench.py: 27.2 ns/lane-step for the dependent
    # pair vs 22.5 for one row), so folding the header in-row removes
    # ~17% of the march's memory floor.  Costs a dense first-row per
    # CELL (empty cells included): (n_cells + overflow) * row_lanes * 4
    # bytes of HBM — prepare() auto-selects it when that fits.
    inline: bool = False

    @property
    def total_voxels(self) -> int:
        nx, ny, nz = self.n_voxels
        return nx * ny * nz


class PackedGridArrays(NamedTuple):
    lower: jnp.ndarray  # (3,) f32
    upper: jnp.ndarray
    width: jnp.ndarray  # (3,)
    inv_width: jnp.ndarray
    cell_info: jnp.ndarray  # (n_cells,) uint32
    blocks: jnp.ndarray  # (n_blocks, 128) f32
    slot_tri: jnp.ndarray  # (n_blocks * BLOCK_TRIS,) i32


@dataclass(frozen=True)
class PackedGrid:
    arrays: PackedGridArrays
    meta: PackedGridMeta


def decode_cell_info(info: jnp.ndarray):
    """uint32 -> (first_block i32, n_blocks i32, dist i32)."""
    first = (info & _FIRST_MASK).astype(jnp.int32)
    nblk = ((info >> _NBLK_SHIFT) & _NBLK_MASK).astype(jnp.int32)
    dist = (info >> _DIST_SHIFT).astype(jnp.int32)
    return first, nblk, dist


def decode_inline_header(row: jnp.ndarray):
    """Inline-layout row -> (overflow_first i32, n_rows i32, dist i32).

    The header rides the last two lanes of every cell's first row as
    bitcast int32: lane[-2] = absolute index of the cell's first
    OVERFLOW row (rows 2..n are contiguous there), lane[-1] =
    n_rows | dist << 16 (n_rows counts the inline row itself).
    Overflow/padding rows carry zero headers — only probe lanes decode.
    """
    h0 = jax.lax.bitcast_convert_type(row[..., -2], jnp.int32)
    h1 = jax.lax.bitcast_convert_type(row[..., -1], jnp.int32)
    return h0, h1 & 0xFFFF, h1 >> 16


def chebyshev_distance_field(occupied: np.ndarray, cap: int = DIST_CAP) -> np.ndarray:
    """Chebyshev (L-inf) distance to the nearest True cell, capped.

    Separable iterative dilation: one 3x3x3 max-dilation per ring.
    occupied: (nx, ny, nz) bool -> (nx, ny, nz) int32.
    """
    dist = np.where(occupied, 0, cap).astype(np.int32)
    frontier = occupied.copy()
    for k in range(1, cap):
        if frontier.all():
            break
        grown = frontier.copy()
        for axis in range(3):
            shifted_fwd = np.roll(grown, 1, axis=axis)
            shifted_bwd = np.roll(grown, -1, axis=axis)
            # roll wraps; kill the wrapped slice
            sl_lo = [slice(None)] * 3
            sl_lo[axis] = 0
            sl_hi = [slice(None)] * 3
            sl_hi[axis] = -1
            shifted_fwd[tuple(sl_lo)] = False
            shifted_bwd[tuple(sl_hi)] = False
            grown = grown | shifted_fwd | shifted_bwd
        newly = grown & ~frontier
        dist[newly] = k
        frontier = grown
    return dist


def pack_grid(
    grid: UniformGrid,
    verts: np.ndarray,
    faces: np.ndarray,
    block_tris: int = BLOCK_TRIS,
    pad_meta: "PackedGridMeta | None" = None,
    as_numpy: bool = False,
    inline: bool = False,
) -> PackedGrid:
    """Build the packed layout from the CSR grid (host-side numpy).

    block_tris sets the row capacity; the row width is 9*block_tris
    rounded up to a multiple of 128 lanes (14 -> 128, 28 -> 256,
    56 -> 512).  Wider rows halve the iteration count for dense voxels
    at slightly higher per-gather cost — tune per scene density.

    inline=True builds the one-gather-per-step layout (see
    PackedGridMeta.inline): `blocks` row `lin` IS cell lin's first
    triangle row with the header bitcast into its last two lanes
    (decode_inline_header); rows past the first live contiguously in an
    overflow region after the n_cells dense rows.  cell_info is a dummy
    (1,) array — the march never gathers it.  Triangle order per cell
    is IDENTICAL to the blocks layout, so hits (including ties) are
    bit-identical between the two.

    pad_meta: a previous build's meta to pad up to, so a jitted
    consumer keyed on PackedGridMeta keeps its compiled step across
    vertex-optimization rebuilds.  Applied when compatible (same
    resolution/row shape, block count fits, probe nudge still sane);
    otherwise the fresh meta is returned and the caller re-jits.
    Padding block rows are unreachable — cell_info never points at
    them.

    as_numpy: keep every array leaf in host numpy (no device upload) —
    for builders that post-process/stack several packs before one
    upload (the ring-pass sharded-geometry build).  Requires a
    host-built grid (grid.host present).
    """
    # inline rows reserve the last two lanes for the bitcast header
    row_lanes = -(-(block_tris * 9 + (2 if inline else 0)) // 128) * 128
    nx, ny, nz = grid.meta.n_voxels
    n_cells = nx * ny * nz
    host = grid.host
    if host is None:  # grid built elsewhere; pull once
        cell_start = np.asarray(grid.arrays.cell_start)
        tri_ids = np.asarray(grid.arrays.tri_ids)
        min_w = float(np.min(np.asarray(grid.arrays.width)))
    else:
        cell_start = host.cell_start
        tri_ids = host.tri_ids
        min_w = float(np.min(host.width))
    counts = np.diff(cell_start).astype(np.int64)

    nblk = (counts + block_tris - 1) // block_tris
    if nblk.max(initial=0) > (0xFFFF if inline else _NBLK_MASK):
        raise ValueError(
            f"voxel with {counts.max()} triangles exceeds the packed-layout "
            f"cap; increase grid resolution"
        )

    # occupancy + distance field (z-major linear index -> (x,y,z) shaped
    # as [z,y,x] to match offset = z*nx*ny + y*nx + x, grid.h:73-75)
    occ = (counts > 0).reshape(nz, ny, nx)
    dist = chebyshev_distance_field(occ).reshape(-1)

    if inline:
        # cell c's first row IS row c; rows 2..n_rows live contiguously
        # in the overflow region starting at n_cells
        overflow = np.maximum(nblk - 1, 0)
        ov_first = np.full(n_cells, n_cells, np.int64)
        np.cumsum(overflow[:-1], out=ov_first[1:])
        ov_first += n_cells
        total_blocks = int(n_cells + overflow.sum())
        total_blocks = max(total_blocks, 1)
        info = np.zeros(1, np.uint32)  # unused by the inline march
    else:
        first = np.zeros(n_cells, np.int64)
        np.cumsum(nblk[:-1], out=first[1:])
        total_blocks = int(first[-1] + nblk[-1]) if n_cells else 0
        total_blocks = max(total_blocks, 1)
        if total_blocks > _FIRST_MASK:
            raise ValueError(
                f"{total_blocks} blocks exceeds the 21-bit block index"
            )
        info = (
            first.astype(np.uint32)
            | (nblk.astype(np.uint32) << _NBLK_SHIFT)
            | (dist.astype(np.uint32) << _DIST_SHIFT)
        )

    # scatter triangle data into block rows (vectorized)
    v = verts.astype(np.float32)[faces]  # (F, 3, 3)
    tri9 = v.reshape(-1, 9)  # (F, 9) [v0 v1 v2]

    blocks = np.zeros((total_blocks, row_lanes), np.float32)
    slot_tri = np.full((total_blocks * block_tris,), -1, np.int32)

    if inline and n_cells:
        # headers into every cell row's last two lanes (empty cells too:
        # the probe reads n_rows=0 + the leap distance from them)
        hdr = blocks[:n_cells, row_lanes - 2:].view(np.int32)
        hdr[:, 0] = ov_first.astype(np.int32)
        hdr[:, 1] = nblk.astype(np.int32) | (dist.astype(np.int32) << 16)

    nnz = tri_ids.shape[0]
    if nnz:
        # CSR entry e belongs to cell c(e); its slot within the cell is
        # e - cell_start[c]; its block row is first[c] + slot//block_tris
        # (blocks layout) or cell/overflow row (inline layout).
        entry_cell = np.repeat(np.arange(n_cells, dtype=np.int64), counts)
        within = np.arange(nnz, dtype=np.int64) - cell_start[entry_cell]
        if inline:
            row = np.where(
                within < block_tris,
                entry_cell,
                ov_first[entry_cell] + within // block_tris - 1,
            )
        else:
            row = first[entry_cell] + within // block_tris
        slot = within % block_tris
        blocks_flat = blocks.reshape(-1)
        lane0 = row * row_lanes + slot * 9
        for c in range(9):
            blocks_flat[lane0 + c] = tri9[tri_ids, c]
        slot_tri[row * block_tris + slot] = tri_ids

    meta = PackedGridMeta(
        n_voxels=(nx, ny, nz),
        n_blocks=total_blocks,
        probe_delta=max(min_w * 1e-3, 1e-6),
        block_tris=block_tris,
        row_lanes=row_lanes,
        max_blocks=int(nblk.max(initial=1)),
        inline=inline,
    )
    if (
        pad_meta is not None
        and pad_meta.inline == inline
        and pad_meta.n_voxels == meta.n_voxels
        and pad_meta.block_tris == block_tris
        and pad_meta.row_lanes == row_lanes
        and pad_meta.n_blocks >= total_blocks
        and pad_meta.max_blocks >= meta.max_blocks
        # the old probe nudge must stay tiny vs the new cells (skip
        # hazard) yet large enough to make progress (march slowdown)
        and 0.2 * meta.probe_delta <= pad_meta.probe_delta <= 5.0 * meta.probe_delta
    ):
        extra = pad_meta.n_blocks - total_blocks
        if extra:
            blocks = np.concatenate(
                [blocks, np.zeros((extra, row_lanes), np.float32)]
            )
            slot_tri = np.concatenate(
                [slot_tri, np.full((extra * block_tris,), -1, np.int32)]
            )
        meta = pad_meta
    if as_numpy:
        assert host is not None, "as_numpy pack requires a host-built grid"
        arrays = PackedGridArrays(
            lower=np.asarray(host.lower, np.float32),
            upper=np.asarray(host.upper, np.float32),
            width=np.asarray(host.width, np.float32),
            inv_width=np.asarray(host.inv_width, np.float32),
            cell_info=info,
            blocks=blocks,
            slot_tri=slot_tri,
        )
        return PackedGrid(arrays=arrays, meta=meta)
    arrays = PackedGridArrays(
        lower=grid.arrays.lower,
        upper=grid.arrays.upper,
        width=grid.arrays.width,
        inv_width=grid.arrays.inv_width,
        cell_info=jnp.asarray(info),
        blocks=jnp.asarray(blocks),
        slot_tri=jnp.asarray(slot_tri),
    )
    return PackedGrid(arrays=arrays, meta=meta)
