"""Anisotropic empty-box leap feasibility study (dense-scene gap).

dense_diag measured nefertiti's march at 5.19 (primary) / 13.44
(shadow) mean lane-steps per ray, 84-87% of them probe/leap steps, 70%
of probes at Chebyshev dist 1 — rays weaving through the ~10-cell
corrugated band leap one cell at a time because the Chebyshev field is
ISOTROPIC (the nearest occupied cell is always one cell away near the
band) while the empty space is ANISOTROPIC (long tangential runs).
tools/bvh_proto.py killed the BVH alternative (39-97 visits/ray vs the
grid's 5-13).

This prototype models replacing the empty-cell Chebyshev radius with a
per-cell greedy MAXIMAL EMPTY BOX (six per-direction extents, grown
round-robin with O(1) emptiness checks against a 3-D summed-area
table).  The box packs into the bits empty cells already waste (their
first/nblk fields), so the march gains ZERO gathers and only trades the
cube exit-t for a box exit-t (same VPU shape).  Occupied-cell visits
and triangle tests are untouched -> hits stay bitwise identical.

The simulator mirrors _march_step's probe/leap/test accounting in
lock-step numpy, terminated by the REAL traversal's t (computed on CPU
via traverse_packed), and reports total lane-steps under (a) the
shipped Chebyshev cube and (b) the greedy box.

Usage: JAX_PLATFORMS=cpu python tools/emptybox_proto.py [scene] [size]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def summed_area(occ):
    """occ (nz,ny,nx) int -> SAT with zero pad: S[z,y,x] = sum of
    occ[:z,:y,:x]."""
    S = np.zeros((occ.shape[0] + 1, occ.shape[1] + 1, occ.shape[2] + 1),
                 np.int64)
    S[1:, 1:, 1:] = occ.astype(np.int64).cumsum(0).cumsum(1).cumsum(2)
    return S


def box_count(S, zlo, zhi, ylo, yhi, xlo, xhi):
    """Inclusive cell-coord box occupancy count; coords clipped to the
    grid (outside the grid is empty by construction)."""
    nz, ny, nx = S.shape[0] - 1, S.shape[1] - 1, S.shape[2] - 1
    zlo = np.clip(zlo, 0, nz); zhi = np.clip(zhi + 1, 0, nz)
    ylo = np.clip(ylo, 0, ny); yhi = np.clip(yhi + 1, 0, ny)
    xlo = np.clip(xlo, 0, nx); xhi = np.clip(xhi + 1, 0, nx)
    return (S[zhi, yhi, xhi] - S[zlo, yhi, xhi] - S[zhi, ylo, xhi]
            - S[zhi, yhi, xlo] + S[zlo, ylo, xhi] + S[zlo, yhi, xlo]
            + S[zhi, ylo, xlo] - S[zlo, ylo, xlo])


def greedy_boxes(occ, cap=31):
    """Per-cell maximal empty box extents for EMPTY cells.

    Returns ext (6, nz, ny, nx) int32 = [x-,x+,y-,y+,z-,z+] extents
    (0 for occupied cells).  Grown round-robin one cell per direction
    per round while the added slab is empty; O(rounds * 6) vectorized
    SAT lookups."""
    nz, ny, nx = occ.shape
    S = summed_area(occ)
    zz, yy, xx = np.meshgrid(np.arange(nz), np.arange(ny), np.arange(nx),
                             indexing="ij")
    ext = np.zeros((6,) + occ.shape, np.int32)
    empty = ~occ
    for _ in range(cap):
        grew = False
        for d in range(6):
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


def simulate(o, d, mint, term_t, lower, width, inv_width, nvox, occ3,
             nrows3, ext=None, cheb=None, delta=1e-5, max_steps=20000):
    """Lock-step probe/leap/test walk mirroring _march_step accounting.

    Counts, per ray: empty-cell probes = 1 step each; occupied-cell
    visits = nrows steps (the probe shares the first row-test step,
    traverse_packed.py:244-251).  Terminated like the real march at
    t_cur > term_t between cells or on grid exit.  ext => anisotropic
    boxes; cheb => the shipped Chebyshev cube.
    """
    nz, ny, nx = occ3.shape
    R = len(o)
    invd = np.where(d != 0, 1.0 / d, np.inf)
    t_cur = np.array(mint, np.float64)
    # slab entry
    upper = lower + width * np.array([nvox[0], nvox[1], nvox[2]])
    t1 = (lower - o) * invd
    t2 = (upper - o) * invd
    lo = np.minimum(t1, t2); hi = np.maximum(t1, t2)
    t0 = np.maximum(np.nanmax(lo, 1), mint)
    t1e = np.nanmin(hi, 1)
    alive = (t0 <= t1e) & np.isfinite(t0)
    t_cur = np.where(alive, t0, t_cur)
    steps = np.zeros(R, np.int64)
    it = 0
    while alive.any() and it < max_steps:
        it += 1
        a = alive
        probe = t_cur[a] + np.maximum(delta, t_cur[a] * 4e-6)
        p = o[a] + d[a] * probe[:, None]
        cell = np.floor((p - lower) * inv_width).astype(np.int64)
        inside = ((cell >= 0) & (cell < np.array(nvox))).all(1)
        cx, cy, cz = (np.clip(cell[:, 0], 0, nvox[0] - 1),
                      np.clip(cell[:, 1], 0, nvox[1] - 1),
                      np.clip(cell[:, 2], 0, nvox[2] - 1))
        occ_l = occ3[cz, cy, cx] & inside
        nrows_l = np.where(occ_l, nrows3[cz, cy, cx], 0)
        # leap box
        if ext is not None:
            exm = ext[:, cz, cy, cx]
            lo_e = np.stack([exm[0], exm[2], exm[4]], 1)
            hi_e = np.stack([exm[1], exm[3], exm[5]], 1)
        else:
            dd = cheb[cz, cy, cx]
            rad = np.maximum(dd, 1)[:, None]
            lo_e, hi_e = rad - 1, rad - 1
        lo_e = np.where(occ_l[:, None], 0, lo_e)
        hi_e = np.where(occ_l[:, None], 0, hi_e)
        blo = lower + (cell - lo_e) * width
        bhi = lower + (cell + hi_e + 1) * width
        with np.errstate(invalid="ignore"):
            tf = np.maximum((blo - o[a]) * invd[a], (bhi - o[a]) * invd[a])
        tf = np.where(np.isnan(tf), np.inf, tf)
        t_exit = np.maximum(np.nanmin(tf, 1), probe)
        steps[a] += np.where(inside, np.maximum(nrows_l, 1), 0)
        t_new = t_exit
        die = ~inside | (t_new > term_t[a])
        t_cur[a] = t_new
        na = a.copy()
        na[a] = ~die
        alive = na
    return steps


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "nefertiti"
    size = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import jax.numpy as jnp
    from ray_tracer_tpu.config import apply_turbo
    from ray_tracer_tpu.models.scenes import (
        serial_scene_config, nefertiti_scene, parallel_scene_config)
    from ray_tracer_tpu.render.renderer import prepare
    from ray_tracer_tpu.ops.camera import camera_rays
    from ray_tracer_tpu.ops.traverse_packed import traverse_packed
    from ray_tracer_tpu.core.rays import RayBatch

    scene = None
    if scene_name == "nefertiti":
        scene, cfg = nefertiti_scene(size, size)
        fam = "nefertiti"
    elif scene_name == "parallel":
        cfg = parallel_scene_config(size, size); fam = "parallel"
    else:
        cfg = serial_scene_config(size, size); fam = "serial"
    cfg = apply_turbo(cfg, fam)
    prep = prepare(cfg, scene=scene)
    meta = prep.packed.meta
    garr = prep.packed.arrays
    print(f"scene={scene_name} {size}x{size} grid={meta.n_voxels} "
          f"bt={meta.block_tris}", flush=True)

    nx, ny, nz = meta.n_voxels
    # occupancy + per-cell row counts from the HOST grid
    g = prep.grid
    cs = np.asarray(g.host.cell_start if g.host is not None
                    else g.arrays.cell_start)
    counts = np.diff(cs)
    bt = meta.block_tris
    nrows = ((counts + bt - 1) // bt).astype(np.int32)
    occ3 = (counts > 0).reshape(nz, ny, nx)
    nrows3 = nrows.reshape(nz, ny, nx)
    from ray_tracer_tpu.accel.packed import chebyshev_distance_field
    cheb = chebyshev_distance_field(occ3)

    t0 = time.time()
    ext = greedy_boxes(occ3)
    print(f"boxes {time.time()-t0:.1f}s; empty-cell mean extent per dir="
          f"{[round(float(ext[i][~occ3].mean()), 2) for i in range(6)]}",
          flush=True)

    lower = np.asarray(garr.lower, np.float64)
    width = np.asarray(garr.width, np.float64)
    inv_width = np.asarray(garr.inv_width, np.float64)
    nvox = (nx, ny, nz)
    delta = meta.probe_delta

    rays = camera_rays(cfg.camera, dtype=jnp.float32)
    res = traverse_packed(rays, garr, meta)
    hit = np.asarray(res.hit)
    t = np.asarray(res.t)
    o = np.asarray(rays.orig, np.float64)
    dirn = np.asarray(rays.dirn, np.float64)
    mint = np.asarray(rays.mint, np.float64)
    maxt = np.asarray(rays.maxt, np.float64)
    term = np.minimum(np.where(hit, t, np.inf), maxt)

    for name, kw in (("cheb", dict(cheb=cheb)), ("box", dict(ext=ext))):
        t0 = time.time()
        st = simulate(o, dirn, mint, term, lower, width, inv_width, nvox,
                      occ3, nrows3, delta=delta, **kw)
        print(f"PRIMARY {name}: mean={st.mean():.2f} "
              f"hit={st[hit].mean():.2f} miss={st[~hit].mean():.2f} "
              f"total={st.sum()} [{time.time()-t0:.0f}s]", flush=True)

    # shadow rays from hit points (nearest-t termination approximates
    # the real any-hit retire cell)
    light = np.asarray(prep.scene.light_pos, np.float64)
    poi = o[hit] + dirn[hit] * t[hit][:, None]
    to_l = light[None] - poi
    sd = to_l / np.linalg.norm(to_l, axis=1, keepdims=True)
    sm = np.full(len(poi), 1e-4 + 0.02)
    smx = np.full(len(poi), np.inf)
    sres = traverse_packed(
        RayBatch(orig=jnp.asarray(poi, jnp.float32),
                 dirn=jnp.asarray(sd, jnp.float32),
                 mint=jnp.asarray(sm, jnp.float32),
                 maxt=jnp.asarray(smx, jnp.float32)),
        garr, meta, t_gate=1e-4 + 0.02)
    sterm = np.minimum(np.where(np.asarray(sres.hit),
                                np.asarray(sres.t), np.inf), smx)
    for name, kw in (("cheb", dict(cheb=cheb)), ("box", dict(ext=ext))):
        t0 = time.time()
        st = simulate(poi, sd, sm, sterm, lower, width, inv_width, nvox,
                      occ3, nrows3, delta=delta, **kw)
        print(f"SHADOW {name}: mean={st.mean():.2f} total={st.sum()} "
              f"[{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
