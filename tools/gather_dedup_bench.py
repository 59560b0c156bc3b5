"""Does the XLA gather engine reward duplicate indices? (No.)

If gathers were bandwidth/cache-bound, routing idle persistent-wave
lanes (empty-cell probes, dead lanes) to one shared dummy row would cut
the measured 16-22 ns/row march floor. Measured on v5e (serial-chained
fori_loop so steps cannot overlap, 8,192 lanes x 128-f32 rows):

    random serial-chain:    21.75 ns/row
    identical (all equal):  21.51 ns/row
    50% routed to row 0:    22.00 ns/row

Identical indices are NOT cheaper -> the engine is issue-bound per
index, not per unique line. Closes the "dummy-row for idle lanes" idea;
the floor is #lanes x ns/index regardless of index distribution.
"""
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import jax
import jax.numpy as jnp
import numpy as np

NB, W, R, STEPS = 8192, 128, 8192, 200


@partial(jax.jit, static_argnames=("steps",))
def march(table, idx0, steps):
    def body(i, c):
        idx, acc = c
        row = table[idx]  # (R, W) gather
        acc = acc + row[:, 0]
        # next indices derive from the fetched data so steps serialize
        idx = (idx + row[:, 1].astype(jnp.int32) + i) % NB
        return (idx, acc)

    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(R, jnp.float32)))
    return acc


def run(name, table, idx0):
    acc = march(table, idx0, STEPS)
    float(jax.device_get(acc[0]))  # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    acc = march(table, idx0, STEPS)
    float(jax.device_get(acc[0]))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / STEPS / R * 1e9:.2f} ns/row")


if __name__ == "__main__":
    table = jnp.asarray(np.random.rand(NB, W), jnp.float32)
    run("random serial-chain", table, jnp.asarray(np.random.randint(0, NB, R), jnp.int32))
    run("identical (all equal)", table, jnp.zeros(R, jnp.int32))
    half = np.random.randint(0, NB, R)
    half[::2] = 0
    run("50% routed to row 0", table, jnp.asarray(half, jnp.int32))
