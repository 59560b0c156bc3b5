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

from ray_tracer_tpu.core import vecmath as vm
from ray_tracer_tpu.ops.camera import camera_rays
from ray_tracer_tpu.ops.traverse import traverse_grid
from ray_tracer_tpu.ops.traverse_packed import traverse_packed


def render_aovs(prep) -> Dict[str, jnp.ndarray]:
    """-> dict of (H, W, ...) buffers: 'depth' (f32, inf on miss),
    'hit' (bool), 'tri_id' (i32, -1 on miss), 'material_id' (i32, -1),
    'normal' (f32 unit, 0 on miss), 'position' (f32, 0 on miss)."""
    cfg = prep.cfg
    rcfg = cfg.render
    h, w = cfg.camera.height, cfg.camera.width
    rays = camera_rays(cfg.camera)
    serial = rcfg.shading == "serial"
    gate = 0.0 if serial else rcfg.shadow_eps

    if rcfg.traversal == "packed":
        res = traverse_packed(
            rays, prep.packed.arrays, prep.packed.meta, t_gate=gate
        )
    else:
        v0, v1, v2 = prep.scene.triangle_soa()
        res = traverse_grid(
            rays, prep.grid.arrays, prep.grid.meta, v0, v1, v2,
            t_gate=gate, early_exit=True, det_dtype=rcfg.det_dtype,
        )

    tri = jnp.maximum(res.tri_id, 0)
    v0, v1, v2 = prep.scene.triangle_soa()
    tv0, tv1, tv2 = v0[tri], v1[tri], v2[tri]
    # geometric normal per the active shading convention
    # (Serial/geometry.h:234-240 vs Parallel/geometry.cuh:160), normalized
    if serial:
        n = vm.normalize(vm.cross(tv0 - tv1, tv2 - tv0))
    else:
        n = vm.normalize(vm.cross(tv2 - tv1, tv0 - tv1))
    hit3 = res.hit[:, None]
    t_safe = jnp.where(res.hit, res.t, 0.0)
    pos = jnp.where(hit3, rays.at(t_safe), 0.0)

    def img(x, ch=None):
        return x.reshape((h, w) if ch is None else (h, w, ch))

    return {
        "depth": img(jnp.where(res.hit, res.t, jnp.inf)),
        "hit": img(res.hit),
        "tri_id": img(jnp.where(res.hit, res.tri_id, -1)),
        "material_id": img(jnp.where(
            res.hit, prep.scene.face_material[tri], -1
        )),
        "normal": img(jnp.where(hit3, n, 0.0), 3),
        "position": img(pos, 3),
    }
