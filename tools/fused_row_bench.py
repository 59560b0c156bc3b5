"""Does fusing the cell_info gather INTO the block row pay?

The production march step (ops/traverse_packed._march_step) issues TWO
random HBM gathers per lane per step:

  1. cell_info[lin]  — one uint32 per lane (dense 3D cell table);
  2. blocks[blk]     — one 128-f32 triangle block row.

The dedup bench showed the gather engine is issue-bound PER INDEX and
nearly width-independent, so gather (1) should cost about as much as
gather (2) even though it moves 4 bytes instead of 512.  If true, a
unified layout — one table whose row carries the cell header in two
spare lanes next to 14 triangles, so every step is exactly ONE gather —
should cut the march's memory floor nearly in half.

This bench serial-chains STEPS iterations (next index derived from the
fetched data so XLA cannot overlap steps) over 8,192 lanes:

  two-gather:  u32 info gather + 128-f32 row gather per step
  one-gather:  a single 128-f32 row gather per step (header in-row)
  info-only :  just the u32 gather (isolates gather-1's cost)
"""
import os
import time
from functools import partial

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/jaxcache")
import jax
import jax.numpy as jnp
import numpy as np

NCELL, NB, W, R, STEPS = 93_500, 8192, 128, 8192, 200


@partial(jax.jit, static_argnames=("steps",))
def two_gather(info, table, idx0, steps):
    def body(i, c):
        lin, acc = c
        inf_row = info[lin]  # gather 1: (R,) u32
        blk = (inf_row & 0xFFFF).astype(jnp.int32) % NB
        row = table[blk]  # gather 2: (R, W) f32
        acc = acc + row[:, 0]
        lin = (lin + row[:, 1].astype(jnp.int32) + i) % NCELL
        return (lin, acc)

    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(R, jnp.float32)))
    return acc


@partial(jax.jit, static_argnames=("steps",))
def one_gather(table, idx0, steps):
    def body(i, c):
        idx, acc = c
        row = table[idx]  # the ONE gather: (R, W) f32, header in lanes 126-127
        hdr = jax.lax.bitcast_convert_type(row[:, 126], jnp.int32)
        acc = acc + row[:, 0]
        idx = (idx + (hdr & 0xFFFF) + i) % NB
        return (idx, acc)

    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(R, jnp.float32)))
    return acc


@partial(jax.jit, static_argnames=("steps",))
def info_only(info, idx0, steps):
    def body(i, c):
        lin, acc = c
        inf_row = info[lin]
        acc = acc + inf_row.astype(jnp.float32)
        lin = (lin + (inf_row & 0xFF).astype(jnp.int32) + i) % NCELL
        return (lin, acc)

    _, acc = jax.lax.fori_loop(0, steps, body, (idx0, jnp.zeros(R, jnp.float32)))
    return acc


def run(name, fn, *args):
    acc = fn(*args, STEPS)
    float(jax.device_get(acc[0]))  # sync (block_until_ready lies on axon)
    t0 = time.perf_counter()
    acc = fn(*args, STEPS)
    float(jax.device_get(acc[0]))
    dt = time.perf_counter() - t0
    print(f"{name}: {dt / STEPS / R * 1e9:.2f} ns/lane-step")


if __name__ == "__main__":
    rng = np.random.default_rng(0)
    info = jnp.asarray(rng.integers(0, 2**20, NCELL), jnp.uint32)
    table = jnp.asarray(rng.random((NB, W)), jnp.float32)
    lin0 = jnp.asarray(rng.integers(0, NCELL, R), jnp.int32)
    idx0 = jnp.asarray(rng.integers(0, NB, R), jnp.int32)
    run("two-gather (info+row)", two_gather, info, table, lin0)
    run("one-gather (row only)", one_gather, table, idx0)
    run("info-only  (u32 only)", info_only, info, lin0)
