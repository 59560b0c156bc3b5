"""Offline BVH feasibility study for the dense-scene gap.

The round-3 verdict's one open perf item is nefertiti (corrugated
displaced sphere, 261k faces) at 7.86 Mrays/s vs the >=12 target; the
uniform grid is measured ~25% off its own structural floor there
(docs/PERFORMANCE.md: 84-87% of lane-steps are probe/leap steps weaving
through the ~10-cell-thick occupied band).  Before building a BVH
traversal path, this prototype answers: does a binary skip-link BVH
with inline-leaf rows (ONE gather per step, the same cost class as the
inline grid march) need fewer lock-step rounds than the grid?

Model: one visit == one march step == one gathered 128-lane row
(identical HBM cost to the grid's inline step; the VPU work per step is
<= the grid's 14-triangle Cramer sweep).  A lock-step wave retires at
its slowest lane, so we report mean AND tail visit counts for real
camera + shadow rays.

Usage: python tools/bvh_proto.py [size] [leaf_tris]
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
from ray_tracer_tpu.models import meshes as mesh_gen  # noqa: E402


def build_bvh(verts, faces, leaf_tris=13, bins=16):
    """Binned-SAH binary BVH (host numpy).  Returns flat DFS arrays:
    box_lo/box_hi (N,3), skip (N,), first/count (N,) with count>0 on
    leaves; children are contiguous in DFS (left = n+1)."""
    f = faces.astype(np.int64)
    tv = verts[f]                      # (F,3,3)
    tlo = tv.min(1)
    thi = tv.max(1)
    cent = (tlo + thi) * 0.5

    order = np.arange(len(f))
    nodes = []                         # dicts; resolved to arrays after

    def make(idx):
        lo = tlo[idx].min(0)
        hi = thi[idx].max(0)
        node = dict(lo=lo, hi=hi, first=-1, count=0, left=-1, right=-1)
        nodes.append(node)
        me = len(nodes) - 1
        if len(idx) <= leaf_tris:
            node["first"], node["count"] = me, len(idx)
            node["tris"] = idx
            return me
        # binned SAH over the widest centroid axis
        c = cent[idx]
        clo, chi = c.min(0), c.max(0)
        axis = int(np.argmax(chi - clo))
        if chi[axis] - clo[axis] < 1e-12:
            half = len(idx) // 2
            l, r = idx[:half], idx[half:]
        else:
            scale = bins / (chi[axis] - clo[axis])
            b = np.minimum((c[:, axis] - clo[axis]) * scale, bins - 1).astype(np.int64)
            best_cost, best_b = np.inf, None
            # prefix/suffix bin bounds
            area = np.zeros(bins)
            cnt = np.bincount(b, minlength=bins)
            lo_b = np.full((bins, 3), np.inf)
            hi_b = np.full((bins, 3), -np.inf)
            for k in range(bins):
                m = b == k
                if m.any():
                    lo_b[k] = tlo[idx][m].min(0)
                    hi_b[k] = thi[idx][m].max(0)
            def sa(lo, hi):
                d = np.maximum(hi - lo, 0)
                return d[..., 0] * d[..., 1] + d[..., 1] * d[..., 2] + d[..., 2] * d[..., 0]
            pre_lo = np.minimum.accumulate(lo_b, 0)
            pre_hi = np.maximum.accumulate(hi_b, 0)
            suf_lo = np.minimum.accumulate(lo_b[::-1], 0)[::-1]
            suf_hi = np.maximum.accumulate(hi_b[::-1], 0)[::-1]
            pre_n = np.cumsum(cnt)
            suf_n = np.cumsum(cnt[::-1])[::-1]
            for k in range(bins - 1):
                nl, nr = pre_n[k], suf_n[k + 1]
                if nl == 0 or nr == 0:
                    continue
                cost = nl * sa(pre_lo[k], pre_hi[k]) + nr * sa(suf_lo[k + 1], suf_hi[k + 1])
                if cost < best_cost:
                    best_cost, best_b = cost, k
            if best_b is None:
                half = len(idx) // 2
                l, r = idx[:half], idx[half:]
            else:
                m = b <= best_b
                l, r = idx[m], idx[~m]
        node["left"] = make(l)
        node["right"] = make(r)
        return me

    sys.setrecursionlimit(1 << 20)
    make(order)
    n = len(nodes)
    box_lo = np.stack([nd["lo"] for nd in nodes]).astype(np.float32)
    box_hi = np.stack([nd["hi"] for nd in nodes]).astype(np.float32)
    count = np.array([nd["count"] for nd in nodes], np.int32)
    tris = [nd.get("tris") for nd in nodes]
    # skip = next node in DFS after my subtree
    skip = np.full(n, n, np.int32)
    def set_skip(me, sk):
        skip[me] = sk
        nd = nodes[me]
        if nd["count"] == 0:
            set_skip(nd["left"], nd["right"])
            set_skip(nd["right"], sk)
    set_skip(0, n)
    return box_lo, box_hi, skip, count, tris


def simulate(box_lo, box_hi, skip, count, tris, tv, o, d, mint, maxt,
             any_hit=False):
    """Lock-step skip-link traversal; returns (visits, best_t) per ray.
    One visit = one row gather (internal: own-box test; leaf: own-box
    test + inline triangle sweep in the SAME row)."""
    n = len(skip)
    R = len(o)
    cur = np.zeros(R, np.int64)
    best = np.full(R, np.inf, np.float32)
    visits = np.zeros(R, np.int64)
    alive = np.ones(R, bool)
    invd = np.where(d != 0, 1.0 / d, np.inf)
    it = 0
    while alive.any():
        it += 1
        c = cur[alive]
        lo, hi = box_lo[c], box_hi[c]
        oa, ia = o[alive], invd[alive]
        t1 = (lo - oa) * ia
        t2 = (hi - oa) * ia
        tn = np.maximum(np.minimum(t1, t2).max(1), mint[alive])
        tf = np.minimum(np.maximum(t1, t2).min(1), np.minimum(maxt[alive], best[alive]))
        hit_box = tn <= tf
        visits[alive] += 1
        leaf = count[c] > 0
        # leaf + box hit: test inline triangles
        for li in np.nonzero(leaf & hit_box)[0]:
            ri = np.nonzero(alive)[0][li]
            tl = tris[c[li]]
            v = tv[tl]
            t = ray_tris(o[ri], d[ri], v)
            m = (t > mint[ri]) & (t < min(maxt[ri], best[ri]))
            if m.any():
                best[ri] = t[m].min()
        nxt = np.where(hit_box & ~leaf, c + 1, skip[c])
        cur[alive] = nxt
        if any_hit:
            alive[alive.copy()] &= ~(np.isfinite(best[alive]))
        a2 = alive.copy()
        a2[alive] = cur[alive] < n
        alive = a2
    return visits, best


def ray_tris(o, d, v):
    """Moller-Trumbore t for one ray vs (K,3,3) tris; inf on miss."""
    e1 = v[:, 1] - v[:, 0]
    e2 = v[:, 2] - v[:, 0]
    p = np.cross(d[None, :], e2)
    det = (e1 * p).sum(1)
    ok = np.abs(det) > 1e-12
    inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
    s = o[None, :] - v[:, 0]
    b = (s * p).sum(1) * inv
    q = np.cross(s, e1)
    g = (d[None, :] * q).sum(1) * inv
    t = (e2 * q).sum(1) * inv
    hit = ok & (b > 0) & (g > 0) & (b + g < 1) & (t > 0)
    return np.where(hit, t, np.inf)


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    leaf = int(sys.argv[2]) if len(sys.argv) > 2 else 13
    mesh = mesh_gen.make_displaced_sphere(n_lat=256, n_lon=512, radius=1.2)
    verts, faces = np.asarray(mesh.verts), np.asarray(mesh.faces)
    print(f"tris={len(faces)}")
    t0 = time.time()
    box_lo, box_hi, skip, count, tris = build_bvh(verts, faces, leaf_tris=leaf)
    n_leaves = int((count > 0).sum())
    print(f"build {time.time()-t0:.1f}s nodes={len(skip)} leaves={n_leaves} "
          f"mean leaf tris={len(faces)/n_leaves:.1f}")

    # camera rays matching nefertiti_scene's camera
    from ray_tracer_tpu.config import CameraConfig
    from ray_tracer_tpu.ops.camera import camera_rays
    import jax.numpy as jnp
    cam = CameraConfig(position=(0.0, 1.5, 4.5), target=(0, 0, 0),
                       up=(0, 1, 0), fov_degrees=45.0, width=size, height=size)
    rb = camera_rays(cam, dtype=jnp.float32)
    o = np.asarray(rb.orig)
    d = np.asarray(rb.dirn)
    mint = np.asarray(rb.mint)
    maxt = np.asarray(rb.maxt)
    tv = verts[faces.astype(np.int64)].astype(np.float32)

    t0 = time.time()
    visits, best = simulate(box_lo, box_hi, skip, count, tris, tv, o, d, mint, maxt)
    hit = np.isfinite(best)
    print(f"PRIMARY ({size}x{size}, {time.time()-t0:.0f}s): visits "
          f"mean={visits.mean():.2f} hit={visits[hit].mean():.2f} "
          f"miss={visits[~hit].mean() if (~hit).any() else 0:.2f} "
          f"p99={np.percentile(visits, 99):.0f} max={visits.max()} "
          f"hits={hit.sum()}/{len(o)}")

    # shadow rays from hit points toward the light (any-hit)
    light = np.array([4.0, 5.0, 3.0], np.float32)
    poi = o[hit] + d[hit] * best[hit][:, None]
    to_l = light[None] - poi
    sd = to_l / np.linalg.norm(to_l, axis=1, keepdims=True)
    so = poi
    smint = np.full(len(so), 1e-3, np.float32)
    smaxt = np.full(len(so), np.inf, np.float32)
    t0 = time.time()
    sv, sbest = simulate(box_lo, box_hi, skip, count, tris, tv, so, sd,
                         smint, smaxt, any_hit=True)
    print(f"SHADOW anyhit ({time.time()-t0:.0f}s): visits mean={sv.mean():.2f} "
          f"p99={np.percentile(sv, 99):.0f} max={sv.max()} "
          f"occluded={np.isfinite(sbest).sum()}/{len(so)}")


if __name__ == "__main__":
    main()
