"""Light-biased empty-box growth feasibility study (round 5).

The round-4 close left nefertiti's fused shadow phase at 46% of all
lane-steps; its escape walk leaps poorly through the corrugated band
(docs/PERFORMANCE.md).  The round-4 verdict's suggestion: grow the
greedy maximal empty boxes DIRECTION-BIASED toward the light, so the
light-aligned extents claim space first and shadow rays leap farther
per probe.

This prototype reuses tools/emptybox_proto.py's lock-step march
simulator and compares total lane-steps (primary + shadow, the fused
frame's cost) under:
  * the shipped balanced round-robin boxes;
  * bias-k growth: the three light-signed directions attempt k growth
    cells per round, the others 1 (k = 2, 4).

Usage: JAX_PLATFORMS=cpu python tools/lightbias_proto.py [scene] [size]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")

from tools.emptybox_proto import box_count, simulate, summed_area  # noqa: E402


def greedy_boxes_biased(occ, light_dir, bias=2, cap=31):
    """Round-robin growth with the light-signed directions attempting
    `bias` cells per round (bias=1 == the shipped balanced growth)."""
    nz, ny, nx = occ.shape
    S = summed_area(occ)
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    ext = np.zeros((6,) + occ.shape, np.int32)
    empty = ~occ
    # direction index order: [x-, x+, y-, y+, z-, z+]
    favored = [
        (1 if light_dir[0] > 0 else 0),
        (3 if light_dir[1] > 0 else 2),
        (5 if light_dir[2] > 0 else 4),
    ]
    for _ in range(cap):
        grew = False
        for d in range(6):
            for _rep in range(bias if d in favored else 1):
                e = ext
                xlo, xhi = xx - e[0], xx + e[1]
                ylo, yhi = yy - e[2], yy + e[3]
                zlo, zhi = zz - e[4], zz + e[5]
                if d == 0:   slab = (zlo, zhi, ylo, yhi, xlo - 1, xlo - 1)
                elif d == 1: slab = (zlo, zhi, ylo, yhi, xhi + 1, xhi + 1)
                elif d == 2: slab = (zlo, zhi, ylo - 1, ylo - 1, xlo, xhi)
                elif d == 3: slab = (zlo, zhi, yhi + 1, yhi + 1, xlo, xhi)
                elif d == 4: slab = (zlo - 1, zlo - 1, ylo, yhi, xlo, xhi)
                else:        slab = (zhi + 1, zhi + 1, ylo, yhi, xlo, xhi)
                ok = empty & (ext[d] < cap) & (box_count(S, *slab) == 0)
                if ok.any():
                    ext[d][ok] += 1
                    grew = True
        if not grew:
            break
    return ext


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "nefertiti"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from ray_tracer_tpu.config import apply_turbo
    from ray_tracer_tpu.core.rays import RayBatch
    from ray_tracer_tpu.models.scenes import nefertiti_scene, serial_scene_config
    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.ops.traverse_packed import traverse_packed
    from ray_tracer_tpu.render.renderer import prepare
    from tools.emptybox_proto import greedy_boxes

    scene = None
    if scene_name == "nefertiti":
        scene, cfg = nefertiti_scene(size, size)
        fam = "nefertiti"
    else:
        cfg = serial_scene_config(size, size)
        fam = "serial"
    cfg = apply_turbo(cfg, fam)
    prep = prepare(cfg, scene=scene)
    meta = prep.packed.meta
    garr = prep.packed.arrays
    nx, ny, nz = meta.n_voxels
    g = prep.grid
    cs = np.asarray(g.host.cell_start if g.host is not None
                    else g.arrays.cell_start)
    counts = np.diff(cs)
    bt = meta.block_tris
    nrows3 = ((counts + bt - 1) // bt).astype(np.int32).reshape(nz, ny, nx)
    occ3 = (counts > 0).reshape(nz, ny, nx)
    lower = np.asarray(garr.lower, np.float64)
    width = np.asarray(garr.width, np.float64)
    inv_width = np.asarray(garr.inv_width, np.float64)
    nvox = (nx, ny, nz)
    delta = meta.probe_delta

    light = np.asarray(prep.scene.light_pos, np.float64)
    centroid = (lower + lower + width * np.array(nvox)) / 2.0
    ldir = light - centroid
    ldir /= np.linalg.norm(ldir)
    print(f"scene={scene_name} {size}^2 grid={meta.n_voxels} light_dir="
          f"{np.round(ldir, 2)}", flush=True)

    rays = camera_rays(cfg.camera, dtype=jnp.float32)
    res = traverse_packed(rays, garr, meta)
    hit = np.asarray(res.hit)
    t = np.asarray(res.t)
    o = np.asarray(rays.orig, np.float64)
    dirn = np.asarray(rays.dirn, np.float64)
    mint = np.asarray(rays.mint, np.float64)
    maxt = np.asarray(rays.maxt, np.float64)
    term = np.minimum(np.where(hit, t, np.inf), maxt)

    # shadow batch from the hit points (production direction: toward
    # the light; any-hit termination approximated by nearest-t)
    poi = o[hit] + dirn[hit] * t[hit][:, None]
    to_l = light[None] - poi
    sd = to_l / np.linalg.norm(to_l, axis=1, keepdims=True)
    quirk = prep.cfg.render.shadow_dir_away_from_light()
    if quirk:
        sd = -sd
    smint = np.full(len(poi), prep.cfg.render.shadow_mint())
    sres = traverse_packed(
        RayBatch.make(jnp.asarray(poi, jnp.float32),
                      jnp.asarray(sd, jnp.float32),
                      mint=jnp.asarray(smint, jnp.float32)),
        garr, meta, t_gate=prep.cfg.render.shadow_eps,
        stop_on_first_hit=True,
    )
    s_hit = np.asarray(sres.hit)
    s_t = np.asarray(sres.t)
    s_term = np.where(s_hit, s_t, np.inf)

    variants = [("balanced", greedy_boxes(occ3))]
    for k in (2, 4):
        t0 = time.time()
        variants.append((f"bias{k}",
                         greedy_boxes_biased(occ3, ldir, bias=k)))
        print(f"bias{k} grown in {time.time() - t0:.0f}s", flush=True)

    for name, ext in variants:
        sp = simulate(o, dirn, mint, term, lower, width, inv_width, nvox,
                      occ3, nrows3, ext=ext, delta=delta)
        ss = simulate(poi, sd, smint, s_term, lower, width, inv_width,
                      nvox, occ3, nrows3, ext=ext, delta=delta)
        print(f"{name}: primary mean={sp.mean():.2f} total={sp.sum()}  "
              f"shadow mean={ss.mean():.2f} total={ss.sum()}  "
              f"frame_total={sp.sum() + ss.sum()}", flush=True)


if __name__ == "__main__":
    main()
