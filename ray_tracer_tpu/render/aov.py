"""AOV (arbitrary output variable) rendering: geometry buffers.

Beyond the reference's single color framebuffer: depth, hit mask,
triangle id, material id, shading normal and hit position per pixel —
the buffers inverse-rendering pipelines, denoisers and debugging tools
consume.  One traversal pass; no shading.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from ray_tracer_tpu.core import vecmath as vm
from ray_tracer_tpu.core.rays import RayBatch
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.traverse import traverse_grid
from ray_tracer_tpu.ops.traverse_packed import traverse_packed


def _trace(prep, rays, stop_on_first_hit=False, gate=None, soa=None):
    """The one primary/occlusion trace dispatch AOV buffers share.

    gate=None uses the primary-hit policy (serial accepts t > 0);
    occlusion queries pass an explicit eps gate so a ray starting ON
    its own triangle cannot re-accept it at t ~ 1e-7.  soa: the
    (v0, v1, v2) gathers, hoistable by callers that trace many times."""
    rcfg = prep.cfg.render
    if gate is None:
        gate = 0.0 if rcfg.shading == "serial" else rcfg.shadow_eps
    if rcfg.traversal == "packed":
        return traverse_packed(
            rays, prep.packed.arrays, prep.packed.meta, t_gate=gate,
            stop_on_first_hit=stop_on_first_hit,
        )
    v0, v1, v2 = prep.scene.triangle_soa() if soa is None else soa
    return traverse_grid(
        rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2,
        t_gate=gate, early_exit=True, det_dtype=rcfg.det_dtype,
        stop_on_first_hit=stop_on_first_hit,
    )


def _aov_buffers(rays, hit, t, tid, mat_ids, tv0, tv1, tv2, serial, h, w):
    """Shared buffer derivation from per-ray hit data — ONE epilogue for
    the single-device, ray-sharded and ring AOV paths."""
    # geometric normal per the active shading convention
    # (Serial/geometry.h:234-240 vs Parallel/geometry.cuh:160), normalized
    if serial:
        n = vm.normalize(vm.cross(tv0 - tv1, tv2 - tv0))
    else:
        n = vm.normalize(vm.cross(tv2 - tv1, tv0 - tv1))
    hit3 = hit[:, None]
    t_safe = jnp.where(hit, t, 0.0)
    pos = jnp.where(hit3, rays.at(t_safe), 0.0)

    def img(x, ch=None):
        return x.reshape((h, w) if ch is None else (h, w, ch))

    return {
        "depth": img(jnp.where(hit, t, jnp.inf)),
        "hit": img(hit),
        "tri_id": img(jnp.where(hit, tid, -1)),
        "material_id": img(jnp.where(hit, mat_ids, -1)),
        "normal": img(jnp.where(hit3, n, 0.0), 3),
        "position": img(pos, 3),
    }


def render_aovs(prep, mesh=None, ring: bool = False,
                ring_grids=None) -> Dict[str, jnp.ndarray]:
    """-> dict of (H, W, ...) buffers: 'depth' (f32, inf on miss),
    'hit' (bool), 'tri_id' (i32, -1 on miss), 'material_id' (i32, -1),
    'normal' (f32 unit, 0 on miss), 'position' (f32, 0 on miss).

    mesh: shard the rays over its "rays" axis (replicated geometry;
    bitwise equal to the single-device buffers).  mesh + ring=True:
    ring-sharded GEOMETRY (each device holds 1/D of the triangles) —
    the inspection path for scenes too big to replicate; ids/flags are
    exact, float buffers match to traversal arithmetic."""
    cfg = prep.cfg
    rcfg = cfg.render
    h, w = cfg.camera.height, cfg.camera.width
    rays = camera_rays(cfg.camera)
    serial = rcfg.shading == "serial"
    gate = 0.0 if serial else rcfg.shadow_eps

    if mesh is not None and ring:
        from ray_tracer_tpu.parallel.shard import trace_ring

        b = trace_ring(prep, rays, mesh, t_gate=gate,
                       ring_grids=ring_grids)
        return _aov_buffers(rays, b["hit"], b["t"], b["tri_id"], b["mat"],
                            b["tv0"], b["tv1"], b["tv2"], serial, h, w)
    if mesh is not None:
        from ray_tracer_tpu.parallel.shard import trace_sharded

        hit, t, tid = trace_sharded(prep, rays, mesh, t_gate=gate)

        class res:  # quack like the traversal result for the epilogue
            pass

        res.hit, res.t, res.tri_id = hit, t, tid
    else:
        res = _trace(prep, rays)

    tri = jnp.maximum(res.tri_id, 0)
    v0, v1, v2 = prep.scene.triangle_soa()
    return _aov_buffers(rays, res.hit, res.t, res.tri_id,
                        prep.scene.face_material[tri],
                        v0[tri], v1[tri], v2[tri], serial, h, w)


def hemisphere_dirs(n: int) -> np.ndarray:
    """Deterministic Fibonacci point set on the +z unit hemisphere ->
    (n,3) numpy, area-uniform (z = (i+0.5)/n, golden-angle azimuth).
    Fixed pattern = reproducible AO on any topology (banding, not
    noise, at low n — same trade as shade.light_sample_offsets)."""
    i = np.arange(n, dtype=np.float64) + 0.5
    z = i / n
    r = np.sqrt(1.0 - z * z)
    th = np.pi * (3.0 - np.sqrt(5.0)) * i
    return np.stack([r * np.cos(th), r * np.sin(th), z], axis=1).astype(
        np.float32
    )


def render_ao(prep, samples: int = 16, radius: float = 1.0,
              mesh=None, ring: bool = False, ring_grids=None) -> jnp.ndarray:
    """Ambient-occlusion map -> (H, W) f32 in [0, 1].

    For each primary hit, `samples` occlusion rays over a deterministic
    Fibonacci hemisphere oriented by the geometric normal; ao = the
    unoccluded fraction within `radius` (1 = fully open; miss pixels =
    1).  Occlusion is a hit with t <= radius (the grid walk is bounded
    by maxt = radius, so a triangle in the final voxel can be tested
    slightly past the radius — the explicit t gate makes the cutoff
    exact).  Production/diagnostic buffer; no reference counterpart.

    mesh: shard rays over its "rays" axis; mesh + ring=True runs every
    hemisphere sample as a ring OCCLUSION ORBIT over sharded geometry
    (normals come from the ring-carried winner vertices) — AO for
    scenes too big to replicate."""
    cfg = prep.cfg
    rcfg = cfg.render
    h, w = cfg.camera.height, cfg.camera.width
    eps = rcfg.shadow_eps
    rays = camera_rays(cfg.camera)
    serial = rcfg.shading == "serial"
    gate0 = 0.0 if serial else eps
    if mesh is not None and ring:
        from ray_tracer_tpu.parallel.shard import trace_ring

        if rcfg.traversal == "packed" and ring_grids is None:
            from ray_tracer_tpu.parallel.shard import build_ring_grids

            ring_grids = build_ring_grids(prep, mesh.shape["tris"])
        b = trace_ring(prep, rays, mesh, t_gate=gate0,
                       ring_grids=ring_grids)
        hit = b["hit"]

        class res:
            pass

        res.hit, res.t = hit, b["t"]
        tv0, tv1, tv2 = b["tv0"], b["tv1"], b["tv2"]
    else:
        if mesh is not None:
            from ray_tracer_tpu.parallel.shard import trace_sharded

            _h, _t, _tid = trace_sharded(prep, rays, mesh, t_gate=gate0)

            class res:
                pass

            res.hit, res.t, res.tri_id = _h, _t, _tid
        else:
            res = _trace(prep, rays)
        hit = res.hit
        tri = jnp.maximum(res.tri_id, 0)
        v0, v1, v2 = prep.scene.triangle_soa()
        tv0, tv1, tv2 = v0[tri], v1[tri], v2[tri]
    if serial:
        n = vm.normalize(vm.cross(tv0 - tv1, tv2 - tv0))
    else:
        n = vm.normalize(vm.cross(tv2 - tv1, tv0 - tv1))
    # face the eye, like any two-sided AO: flip normals pointing away
    n = jnp.where(vm.dot(n, rays.dirn)[:, None] > 0, -n, n)

    t_safe = jnp.where(hit, res.t, 0.0)
    poi = rays.at(t_safe)
    orig = jnp.where(hit[:, None], poi, jnp.inf)  # dead lanes retire on entry

    # tangent frame per hit (helper axis chosen away from n)
    a = jnp.where(
        (jnp.abs(n[:, 0]) < 0.9)[:, None],
        jnp.asarray([1.0, 0.0, 0.0], n.dtype),
        jnp.asarray([0.0, 1.0, 0.0], n.dtype),
    )
    t1 = vm.normalize(vm.cross(a, n))
    t2 = vm.cross(n, t1)

    # occlusion rays start ON their own triangle: gate t > eps like the
    # renderer's shadow traces (the serial primary gate of 0 would
    # re-accept the origin triangle at t ~ 1e-7 and read AO ~ 0.5
    # everywhere); any-hit is enough, and the soa gathers are hoisted
    soa = None if (mesh is not None) else prep.scene.triangle_soa()
    occ = jnp.zeros((rays.count,), jnp.float32)
    for d in hemisphere_dirs(samples):
        dirn = d[0] * t1 + d[1] * t2 + d[2] * n
        srays = RayBatch.make(orig, dirn, mint=eps, maxt=radius)
        if mesh is not None and ring:
            from ray_tracer_tpu.parallel.shard import trace_ring

            sb = trace_ring(prep, srays, mesh, t_gate=eps,
                            stop_first=True, ring_grids=ring_grids)
            s_hit, s_t = sb["hit"], sb["t"]
        elif mesh is not None:
            from ray_tracer_tpu.parallel.shard import trace_sharded

            s_hit, s_t, _ = trace_sharded(prep, srays, mesh, t_gate=eps,
                                          stop_first=True)
        else:
            sres = _trace(prep, srays, stop_on_first_hit=True, gate=eps,
                          soa=soa)
            s_hit, s_t = sres.hit, sres.t
        occ = occ + (s_hit & (s_t <= radius) & hit).astype(jnp.float32)
    ao = jnp.where(hit, 1.0 - occ / samples, 1.0)
    return ao.reshape(h, w)
