"""VERDICT r1 #1b experiment: can a Pallas scalar-prefetch pipeline beat
XLA's gather engine for the march's per-lane block-row fetch?

The march step's hot pattern: W lanes each fetch ONE block row (index
computed in-loop) and run a Cramer test on its triangles.  XLA lowers
blocks[blk] to its native gather; Mosaic has no per-lane vector gather
("Cannot do int indexing"), but PrefetchScalarGridSpec can map ONE grid
program per row with the row index prefetched — the pipeline DMAs row
idx[i] for program i (double-buffered).  Both variants here use the
SAME channel-major row layout (NB, 9, TL): 9 triangle-component
channels x TL triangle lanes, so the kernel body is pure elementwise
VPU math (Mosaic cannot reshape 1-D rows into (tris, 9)).

Run on TPU: python _pallas_gather_bench.py
Correctness check on CPU: JAX_PLATFORMS=cpu python _pallas_gather_bench.py check
"""
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import jax
import jax.numpy as jnp
import numpy as np

if "check" in sys.argv:
    jax.config.update("jax_platforms", "cpu")

W = 8192          # wave lanes
NB = 2270         # block rows (~spot tri count at 128 tris/row)
TL = 128          # triangle lanes per row
CH = 9            # ax ay az bx by bz cx cy cz


def cramer_min(o, d, row):
    """o,d (3,) broadcast against row (CH, TL) -> nearest accepted t."""
    a = row[0:3]          # (3, TL)
    b = row[3:6]
    c = row[6:9]
    e1 = a - b
    e2 = a - c
    s = a - o[:, None]
    de = d[:, None]
    def det3(u, v, w):
        return (u[0] * (v[1] * w[2] - v[2] * w[1])
                - v[0] * (u[1] * w[2] - u[2] * w[1])
                + w[0] * (u[1] * v[2] - u[2] * v[1]))
    A = det3(e1, e2, de)
    tn = det3(e1, e2, s)
    bn = det3(s, e2, de)
    gn = det3(e1, s, de)
    inv = 1.0 / A
    t = tn * inv
    beta = bn * inv
    gamma = gn * inv
    ok = (beta > 0) & (gamma > 0) & (beta + gamma < 1) & (t > 0)
    return jnp.min(jnp.where(ok, t, jnp.inf), axis=-1)


# ---------------- A: XLA gather + fused test ---------------------------
@functools.partial(jax.jit, static_argnums=0)
def xla_step_loop(n, blocks, o, d, idx0):
    def body(i, carry):
        acc, idx = carry
        row = blocks[idx]                       # (W, CH, TL) gather
        t = jax.vmap(cramer_min)(o, d, row)
        # fold t into the next idx so the loop is sequential like the
        # real march (the next fetch depends on this step's result)
        idx = (idx + 1 + (jnp.isfinite(t)).astype(jnp.int32)) % NB
        return acc + jnp.where(jnp.isfinite(t), t, 0.0), idx
    acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((W,), jnp.float32), idx0))
    return acc


# ---------------- B: Pallas scalar-prefetch pipeline -------------------
def _pl_kernel(idx_ref, o_ref, d_ref, row_ref, t_ref):
    o = o_ref[0, 0]
    d = d_ref[0, 0]
    t_ref[...] = cramer_min(o, d, row_ref[0]).reshape(1, 1, 1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_gather_test(blocks, o, d, idx, interpret=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(W,),
        in_specs=[
            pl.BlockSpec((1, 1, 3), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, 1, 3), lambda i, idx: (i, 0, 0)),
            pl.BlockSpec((1, CH, TL), lambda i, idx: (idx[i], 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, 1), lambda i, idx: (i, 0, 0)),
    )
    return pl.pallas_call(
        _pl_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((W, 1, 1), jnp.float32),
        interpret=interpret,
    )(idx, o[:, None, :], d[:, None, :], blocks)[:, 0, 0]


@functools.partial(jax.jit, static_argnums=0)
def pallas_step_loop(n, blocks, o, d, idx0):
    def body(i, carry):
        acc, idx = carry
        t = pallas_gather_test(blocks, o, d, idx)
        idx = (idx + 1 + (jnp.isfinite(t)).astype(jnp.int32)) % NB
        return acc + jnp.where(jnp.isfinite(t), t, 0.0), idx
    acc, _ = jax.lax.fori_loop(0, n, body, (jnp.zeros((W,), jnp.float32), idx0))
    return acc


def main():
    g = np.random.default_rng(0)
    # plausible triangle soup rows: tris in [0,1]^3, rays from origin-ish
    blocks = jnp.asarray(g.uniform(0, 1, (NB, CH, TL)).astype(np.float32))
    o = jnp.asarray(g.uniform(-2, -1, (W, 3)).astype(np.float32))
    d = jnp.asarray(
        (lambda v: v / np.linalg.norm(v, axis=1, keepdims=True))(
            g.normal(size=(W, 3))
        ).astype(np.float32)
    )
    idx0 = jnp.asarray(g.integers(0, NB, (W,)).astype(np.int32))

    if "check" in sys.argv:
        want = jax.vmap(cramer_min)(o, d, blocks[idx0])
        got = pallas_gather_test(blocks, o, d, idx0, interpret=True)
        h = np.isfinite(np.asarray(want))
        np.testing.assert_allclose(
            np.asarray(got)[h], np.asarray(want)[h], rtol=1e-5
        )
        assert (np.isfinite(np.asarray(got)) == h).all()
        print(f"interpret-mode parity OK ({int(h.sum())}/{W} finite)")
        return

    def timed(name, fn):
        def sync(x):
            float(jax.device_get(x[0]))
        sync(fn(5, blocks, o, d, idx0))
        sync(fn(105, blocks, o, d, idx0))
        best = 1e18
        for _ in range(3):
            t0 = time.perf_counter(); sync(fn(105, blocks, o, d, idx0))
            t1 = time.perf_counter(); sync(fn(5, blocks, o, d, idx0))
            t2 = time.perf_counter()
            best = min(best, ((t1 - t0) - (t2 - t1)) / 100)
        print(f"{name:24s} {best*1e6:9.1f} us/step "
              f"({best/W*1e9:.1f} ns/row)", flush=True)

    timed("xla gather+test", xla_step_loop)
    timed("pallas prefetch+test", pallas_step_loop)


if __name__ == "__main__":
    main()
