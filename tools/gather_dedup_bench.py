"""Does the XLA gather engine reward duplicate indices? (Barely.)

If gathers were bandwidth/cache-bound, routing idle persistent-wave
lanes (empty-cell probes, dead lanes) to one shared dummy row would cut
the measured 16-22 ns/row march floor. Measured on v5e (serial-chained
fori_loop so steps cannot overlap, 8,192 lanes x 128-f32 rows; dummy
lanes RE-PINNED to row 0 inside the loop so the 50% case really is
"idle lanes parked on one fixed row"):

    random serial-chain:    21.62 ns/row
    identical (all equal):  21.69 ns/row
    50% pinned to row 0:    19.60 ns/row

Identical moving indices are NOT cheaper, and a fixed dummy row saves
only ~9% even with HALF the lanes parked on it -> the engine is
issue-bound per index, nearly independent of index distribution.
Closes the "dummy-row for idle lanes" idea: the floor is
#lanes x ns/index, and only fewer lane-steps move it materially.
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
def march(table, idx0, dummy_mask, steps):
    def body(i, c):
        idx, acc = c
        row = table[idx]  # (R, W) gather
        acc = acc + row[:, 0]
        # next indices derive from the fetched data so steps serialize;
        # dummy lanes are RE-PINNED to row 0 every step so the 50% case
        # measures "idle lanes parked on one fixed row", not "50%
        # duplicated drifting indices"
        idx = (idx + row[:, 1].astype(jnp.int32) + i) % NB
        idx = jnp.where(dummy_mask, 0, idx)
        return (idx, acc)

    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(R, jnp.float32)))
    return acc


def run(name, table, idx0, dummy_mask=None):
    if dummy_mask is None:
        dummy_mask = jnp.zeros(R, bool)
    acc = march(table, idx0, dummy_mask, STEPS)
    float(jax.device_get(acc[0]))  # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    acc = march(table, idx0, dummy_mask, STEPS)
    float(jax.device_get(acc[0]))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / STEPS / R * 1e9:.2f} ns/row")


if __name__ == "__main__":
    table = jnp.asarray(np.random.rand(NB, W), jnp.float32)
    run("random serial-chain", table, jnp.asarray(np.random.randint(0, NB, R), jnp.int32))
    run("identical (all equal)", table, jnp.zeros(R, jnp.int32))
    half = np.random.randint(0, NB, R)
    half[::2] = 0
    mask = np.zeros(R, bool)
    mask[::2] = True
    run("50% pinned to row 0", table, jnp.asarray(half, jnp.int32),
        jnp.asarray(mask))
