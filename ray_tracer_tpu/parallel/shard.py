"""shard_map renderers: SPMD over a device mesh.

The scaling layer the reference never had (its one GPU tops out at the
64x64 hard-coded framebuffer, Parallel/raytracer.cu:16).  Two shardings:

  * **ray sharding** (`render_sharded`) — the pixel/ray batch is split
    on its leading axis over the "rays" mesh axis; geometry, grid and
    materials are replicated.  Each shard runs the same fused
    camera→DDA→shade program on its slice; the image gather is the
    out-spec.  Gradients w.r.t. the replicated scene transpose to a
    `psum` over the mesh automatically (shard_map's replicated-input
    rule), which XLA overlaps with the backward pass.

  * **triangle sharding** (`intersect_brute_sharded`) — for scenes too
    big to replicate, the triangle soup is split over the "tris" axis;
    every shard intersects all rays against its slice and per-ray
    nearest hits are combined with an all_gather + min-reduce that
    preserves the reference's lowest-triangle-index tie-break
    (Serial/geometry.h:164-171: strict '<' keeps the first-seen hit).

Tile striding: consecutive image rows land on different shards
(`stride_permutation`) so dense-mesh rows and empty-sky rows spread
evenly — the load-balance fix for BASELINE.md's >=85% scaling target.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh
from jax.sharding import PartitionSpec as P

from ray_tracer_tpu.accel.grid import GridArrays, GridMeta
from ray_tracer_tpu.config import SceneConfig
from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.models.scenes import Scene
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.intersect import BruteResult, barycentric_pass, cramer_tbg
from ray_tracer_tpu.parallel.mesh import make_mesh
from ray_tracer_tpu.render.renderer import (
    Prepared,
    pad_rays,
    render_rays_tiled,
    render_rays_tiled_sorted,
)


from ray_tracer_tpu.render.renderer import _pad_to  # shared rounding helper


def stride_permutation(n: int, shards: int) -> np.ndarray:
    """Permutation that deals items round-robin to shards (and its use as
    an inverse gather): shard s gets items s, s+shards, s+2*shards, ...
    Interleaving pixels breaks up coherent empty-sky runs so per-shard
    work is statistically even."""
    idx = np.arange(n)
    return np.concatenate([idx[s::shards] for s in range(shards)])


@lru_cache(maxsize=32)
def _sharded_image_fn(meta: GridMeta, cfg: SceneConfig, mesh: Mesh, axis: str, balance: bool):
    n_shards = mesh.shape[axis]
    rcfg = cfg.render
    h, w = cfg.camera.height, cfg.camera.width
    r = h * w * rcfg.spp * rcfg.spp
    padded = _pad_to(r, n_shards)
    perm = stride_permutation(padded, n_shards) if balance else np.arange(padded)
    inv_perm = np.argsort(perm)

    def shard_body(scene: Scene, grid, rays: RayBatch) -> jnp.ndarray:
        if rcfg.traversal == "packed":
            return render_rays_tiled_sorted(rays, scene, grid, meta, rcfg)
        return render_rays_tiled(rays, scene, grid, meta, rcfg)

    sharded = jax.shard_map(
        shard_body,
        mesh=mesh,
        in_specs=(P(), P(), P(axis)),
        out_specs=P(axis),
    )

    @jax.jit
    def run(scene: Scene, grid: GridArrays) -> jnp.ndarray:
        rays = camera_rays(cfg.camera, dtype=jnp.dtype(rcfg.dtype), spp=rcfg.spp)
        rays = pad_rays(rays, padded)
        rays = jax.tree.map(lambda x: x[jnp.asarray(perm)], rays)
        colors = sharded(scene, grid, rays)
        colors = colors[jnp.asarray(inv_perm)][:r]
        if rcfg.spp > 1:
            colors = colors.reshape(rcfg.spp * rcfg.spp, -1, 3).mean(axis=0)
        return colors.reshape(h, w, 3)

    return run


def render_sharded(
    prep: Prepared,
    mesh: Optional[Mesh] = None,
    axis: str = "rays",
    balance: bool = True,
) -> jnp.ndarray:
    """Render with rays sharded over `axis` of `mesh` -> (H, W, 3)."""
    if mesh is None:
        mesh = make_mesh()
    if prep.cfg.render.traversal == "packed":
        fn = _sharded_image_fn(prep.packed.meta, prep.cfg, mesh, axis, balance)
        return fn(prep.scene, prep.packed.arrays)
    fn = _sharded_image_fn(prep.grid.meta, prep.cfg, mesh, axis, balance)
    return fn(prep.scene, prep.grid.arrays)


# ---------------------------------------------------------------------------
# Triangle-sharded all-pairs intersection (geometry model-parallelism)
# ---------------------------------------------------------------------------


def _local_best(rays, v0, v1, v2, tri_offset, t_lower, det_dtype):
    """Per-shard nearest hit over the local triangle slice, ids global."""
    t, beta, gamma = cramer_tbg(
        rays.orig[:, None, :], rays.dirn[:, None, :],
        v0[None], v1[None], v2[None], det_dtype=det_dtype,
    )
    passed = barycentric_pass(beta, gamma)
    accept = passed if t_lower is None else passed & (t > t_lower)
    t_masked = jnp.where(accept, t, jnp.asarray(jnp.inf, t.dtype))
    j = jnp.argmin(t_masked, axis=1).astype(jnp.int32)
    t_best = jnp.take_along_axis(t_masked, j[:, None], axis=1)[:, 0]
    return jnp.any(passed, axis=1), t_best.astype(jnp.float32), j + tri_offset


@lru_cache(maxsize=32)
def _sharded_intersect_fn(mesh: Mesh, rays_axis: Optional[str], tris_axis: str,
                          t_lower, det_dtype: str, n_tris_padded: int):
    ddt = jnp.dtype(det_dtype)
    n_tri_shards = mesh.shape[tris_axis]
    shard_tris = n_tris_padded // n_tri_shards

    def body(rays: RayBatch, v0, v1, v2):
        my = jax.lax.axis_index(tris_axis)
        any_p, t, tid = _local_best(rays, v0, v1, v2, my * shard_tris, t_lower, ddt)
        # Combine shard-local winners: (S, R) gather, then the reference's
        # strict-< update order == min t with lowest global id tie-break.
        ts = jax.lax.all_gather(t, tris_axis)  # (S, R)
        ids = jax.lax.all_gather(tid, tris_axis)
        anys = jax.lax.all_gather(any_p, tris_axis)
        # argmin keeps the FIRST minimum; shards are ordered by global-id
        # range, so equal-t ties resolve to the lowest triangle id —
        # the reference's strict-< first-seen-wins update.
        s_best = jnp.argmin(ts, axis=0)
        t_best = jnp.take_along_axis(ts, s_best[None], axis=0)[0]
        id_best = jnp.take_along_axis(ids, s_best[None], axis=0)[0]
        return BruteResult(
            any_pass=jnp.any(anys, axis=0),
            t=t_best,
            tri_id=id_best,
            hit=jnp.isfinite(t_best),
        )

    rspec = P(rays_axis) if rays_axis else P()
    # check_vma=False: after the all_gather + argmin the result is
    # bit-identical on every tris shard, but the varying-axes checker
    # cannot prove post-gather replication.
    return jax.jit(jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(rspec, P(tris_axis), P(tris_axis), P(tris_axis)),
        out_specs=rspec,
        check_vma=False,
    ))


def intersect_brute_sharded(
    rays: RayBatch,
    v0: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    mesh: Mesh,
    rays_axis: Optional[str] = "rays",
    tris_axis: str = "tris",
    t_lower: Optional[float] = None,
    det_dtype: str = "float32",
) -> BruteResult:
    """All-pairs nearest hit with triangles sharded over `tris_axis`
    (and rays optionally over `rays_axis`).  Padding triangles are
    degenerate (all-zero) and never pass the barycentric test."""
    f = v0.shape[0]
    n_tri_shards = mesh.shape[tris_axis]
    fp = _pad_to(f, n_tri_shards)
    if fp != f:
        z = jnp.zeros((fp - f, 3), v0.dtype)
        v0, v1, v2 = (jnp.concatenate([x, z]) for x in (v0, v1, v2))
    n_ray_shards = mesh.shape[rays_axis] if rays_axis else 1
    r = rays.count
    rp = _pad_to(r, n_ray_shards)
    rays_p = pad_rays(rays, rp)
    fn = _sharded_intersect_fn(mesh, rays_axis, tris_axis, t_lower, det_dtype, fp)
    res = fn(rays_p, v0, v1, v2)
    out = jax.tree.map(lambda x: x[:r], res)
    # padded triangle never passes, but clamp ids into the valid range
    return out._replace(tri_id=jnp.where(out.hit, jnp.minimum(out.tri_id, f - 1), out.tri_id))
