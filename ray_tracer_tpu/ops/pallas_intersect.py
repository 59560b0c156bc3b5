"""Pallas TPU kernel: tiled all-pairs ray/triangle intersection.

The naive integrator the reference keeps as a cross-check
(Serial/raytracer.cpp:21-69, Parallel/raytracer.cu:372-443) sweeps every
(ray, triangle) pair.  On TPU that sweep is compute-bound VPU work with
a tiny working set — exactly the shape Pallas controls well:

  * the whole triangle soup (9 floats/tri, SoA padded) stays resident
    in VMEM across the ray grid (≤ ~45k tris in 1.6 MB);
  * each kernel instance owns a tile of rays and marches the triangle
    soup in TILE_T-column chunks, keeping the (TILE_R, TILE_T)
    determinant intermediates in registers/VMEM — nothing round-trips
    through HBM;
  * the nearest-hit reduction is online: per-chunk min + lowest-index
    tie-break folded into a running (best_t, best_id) carry, matching
    the reference's strict-< first-seen-wins update
    (Serial/geometry.h:164-171).

Same algebraic formulation as ops/intersect.cramer_tbg (determinant
expansion per component); not bitwise vs the XLA path (different fusion)
— cross-checked in tests to hit/tri/t-tolerance equality.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.intersect import BruteResult

TILE_R = 256  # rays per kernel instance
TILE_T = 512  # triangle columns per inner chunk


def _cdiv(a, b):
    return -(-a // b)


def _kernel(o_ref, d_ref, tri_ref, t_ref, id_ref, *, n_chunks, t_lower):
    import jax.numpy as jnp

    o = o_ref[:]  # (TILE_R, 3)
    d = d_ref[:]
    ox, oy, oz = o[:, 0:1], o[:, 1:2], o[:, 2:3]  # (R,1)
    dx, dy, dz = d[:, 0:1], d[:, 1:2], d[:, 2:3]
    inf = jnp.float32(jnp.inf)
    big_id = jnp.int32(2**31 - 1)

    col = jax.lax.broadcasted_iota(jnp.int32, (TILE_R, TILE_T), 1)

    def chunk(k, carry):
        best_t, best_id = carry
        from jax.experimental import pallas as pl

        tri = tri_ref[:, pl.ds(k * TILE_T, TILE_T)]  # (9, TILE_T)
        ax, ay, az = tri[0:1], tri[1:2], tri[2:3]  # (1, T)
        bx, by, bz = tri[3:4], tri[4:5], tri[5:6]
        cx, cy, cz = tri[6:7], tri[7:8], tri[8:9]

        e1x, e1y, e1z = ax - bx, ay - by, az - bz  # v0 - v1  (1,T)
        e2x, e2y, e2z = ax - cx, ay - cy, az - cz  # v0 - v2
        sx, sy, sz = ax - ox, ay - oy, az - oz  # v0 - orig  (R,T)

        # det [e1 e2 d] and Cramer numerators, expanded per component
        n_e = e1y * e2z - e1z * e2y  # (1,T)
        A = e1x * (e2y * dz - e2z * dy) - e2x * (e1y * dz - e1z * dy) + dx * n_e
        tn = e1x * (e2y * sz - e2z * sy) - e2x * (e1y * sz - e1z * sy) + sx * n_e
        bn = sx * (e2y * dz - e2z * dy) - e2x * (sy * dz - sz * dy) + dx * (sy * e2z - sz * e2y)
        gn = e1x * (sy * dz - sz * dy) - sx * (e1y * dz - e1z * dy) + dx * (e1y * sz - e1z * sy)

        inv_a = 1.0 / A  # +/-inf on parallel pairs; strict tests reject
        t = tn * inv_a
        beta = bn * inv_a
        gamma = gn * inv_a
        accept = (beta > 0) & (gamma > 0) & (beta + gamma < 1)
        if t_lower is not None:
            accept = accept & (t > t_lower)
        tm = jnp.where(accept, t, inf)

        # per-chunk min with lowest-column tie-break
        cmin = jnp.min(tm, axis=1, keepdims=True)  # (R,1)
        cid = jnp.min(
            jnp.where(tm == cmin, col + k * TILE_T, big_id), axis=1, keepdims=True
        )
        upd = (cmin < best_t) & (cmin < inf)
        best_id = jnp.where(upd, cid, best_id)
        best_t = jnp.where(upd, cmin, best_t)
        return best_t, best_id

    init = (
        jnp.full((TILE_R, 1), inf, jnp.float32),
        jnp.full((TILE_R, 1), -1, jnp.int32),
    )
    best_t, best_id = jax.lax.fori_loop(0, n_chunks, chunk, init)
    t_ref[:] = best_t
    id_ref[:] = best_id


@functools.partial(jax.jit, static_argnames=("t_lower", "n_tris", "interpret"))
def _run(orig, dirn, tri9, t_lower, n_tris, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    r = orig.shape[0]
    tp = tri9.shape[1]
    n_chunks = tp // TILE_T
    grid = (r // TILE_R,)

    t, tid = pl.pallas_call(
        functools.partial(_kernel, n_chunks=n_chunks, t_lower=t_lower),
        grid=grid,
        interpret=interpret,
        in_specs=[
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r, 1), jnp.float32),
            jax.ShapeDtypeStruct((r, 1), jnp.int32),
        ],
    )(orig, dirn, tri9)
    t = t[:, 0]
    tid = tid[:, 0]
    hit = jnp.isfinite(t) & (tid >= 0) & (tid < n_tris)
    return BruteResult(any_pass=hit, t=t, tri_id=jnp.where(hit, tid, -1), hit=hit)


def pallas_available() -> bool:
    return jax.default_backend() == "tpu"


def intersect_brute_pallas(
    rays: RayBatch,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    t_lower: Optional[float] = 0.0,
) -> BruteResult:
    """All-pairs nearest hit via the Pallas kernel (f32, production
    semantics).  Rays pad with +inf origins (never accept); triangles pad
    with degenerate zeros (zero determinant never accepts)."""
    f = v0.shape[0]
    r = rays.count
    rp = _cdiv(r, TILE_R) * TILE_R
    tp = _cdiv(f, TILE_T) * TILE_T

    orig = jnp.concatenate(
        [rays.orig.astype(jnp.float32),
         jnp.full((rp - r, 3), jnp.inf, jnp.float32)]
    ) if rp != r else rays.orig.astype(jnp.float32)
    dirn = jnp.concatenate(
        [rays.dirn.astype(jnp.float32), jnp.ones((rp - r, 3), jnp.float32)]
    ) if rp != r else rays.dirn.astype(jnp.float32)

    tri9 = jnp.concatenate(
        [v0.astype(jnp.float32), v1.astype(jnp.float32), v2.astype(jnp.float32)],
        axis=1,
    ).T  # (9, F)
    if tp != f:
        tri9 = jnp.concatenate([tri9, jnp.zeros((9, tp - f), jnp.float32)], axis=1)

    # Off-TPU (tests, CPU dev) the kernel runs in interpreter mode.
    res = _run(orig, dirn, tri9, t_lower, f, interpret=not pallas_available())
    return jax.tree.map(lambda x: x[:r], res)
