"""Does XLA overlap two INDEPENDENT gather->compute chains on TPU?

Models the persistent march round: per lane, gather a random 126-lane
block row from HBM, then VPU-heavy Cramer-like math on it.  Compares
  (a) one W-lane chain running 2N dependent iterations
  (b) two W-lane chains, independent state, N iterations each,
      interleaved in ONE loop body (same total gathers + flops)
If (b) beats (a), the scheduler hides one chain's gather under the
other's compute, and the dual-wave persistent march is worth building.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

W = 8192
ROWS = 65536
LANES = 126  # 14 tris x 9 f32
ITERS = 400


def make_table(key):
    return jax.random.uniform(key, (ROWS, LANES), jnp.float32)


def step(table, idx, acc):
    """One march-like step: gather row, fake Cramer (~60 flops/lane-col),
    derive the next (data-dependent) row index."""
    rows = table[idx]  # (W, LANES) gather
    a, b, c = rows[:, :42], rows[:, 42:84], rows[:, 84:126]
    det = a * (b * c - c * 0.5) - b * (a * c - b) + c * (a * b - a)
    m = det.sum(axis=1)
    acc = acc + m
    idx = (idx + (m.astype(jnp.int32) & 1023) + 1) % ROWS
    return idx, acc


@jax.jit
def chain_single(table, idx, n):
    def body(_, s):
        i, a = s
        i, a = step(table, i, a)
        i, a = step(table, i, a)
        return (i, a)

    idx, acc = jax.lax.fori_loop(0, n, body, (idx, jnp.zeros((W,), jnp.float32)))
    return acc


@jax.jit
def chain_dual(table, idx1, idx2, n):
    def body(_, s):
        i1, a1, i2, a2 = s
        i1, a1 = step(table, i1, a1)
        i2, a2 = step(table, i2, a2)
        return (i1, a1, i2, a2)

    z = jnp.zeros((W,), jnp.float32)
    i1, a1, i2, a2 = jax.lax.fori_loop(0, n, body, (idx1, z, idx2, z))
    return a1 + a2


def sync(x):
    return float(jax.device_get(x[0]))


def main():
    key = jax.random.PRNGKey(0)
    table = make_table(key)
    idx1 = jax.random.randint(jax.random.PRNGKey(1), (W,), 0, ROWS)
    idx2 = jax.random.randint(jax.random.PRNGKey(2), (W,), 0, ROWS)

    # warm
    sync(chain_single(table, idx1, ITERS))
    sync(chain_dual(table, idx1, idx2, ITERS))

    for name, fn in [
        ("single 2N dependent steps", lambda: chain_single(table, idx1, ITERS)),
        ("dual   N+N interleaved    ", lambda: chain_dual(table, idx1, idx2, ITERS)),
    ]:
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn())
            best = min(best, time.perf_counter() - t0)
        # both run 2*ITERS*W gathers total
        per_gather = best / (2 * ITERS) / W * 1e9
        print(f"{name}: {best*1e3:8.2f} ms   {per_gather:6.2f} ns/row")


if __name__ == "__main__":
    main()
