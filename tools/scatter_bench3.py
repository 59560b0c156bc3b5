import os, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR","/root/jaxcache")
import jax, jax.numpy as jnp, numpy as np
R, W = 1_048_576, 16_384
key = jax.random.PRNGKey(0)
idx0 = jax.random.permutation(key, R)[:W].astype(jnp.int32)

def timed(name, fn, *args):
    f = jax.jit(fn, static_argnums=0)
    def sync(r): float(jax.device_get(jnp.ravel(r if not isinstance(r,tuple) else r[0])[0]))
    sync(f(10, *args)); sync(f(410, *args))  # warm BOTH trip counts
    best = 1e9
    for _ in range(3):
        t0=time.perf_counter(); sync(f(410, *args)); t1=time.perf_counter()
        t2=time.perf_counter(); sync(f(10, *args)); t3=time.perf_counter()
        best = min(best, ((t1-t0)-(t3-t2))/400)
    print(f"{name:32s} {best*1e6:8.1f} us/iter", flush=True)

def loop(n, body, state):
    return jax.lax.fori_loop(0, n, lambda i,s: body(s,i), state)

def empty(n, idx):
    acc = jnp.zeros((W,), jnp.float32)
    return loop(n, lambda s,i: s + 1.0, acc)
def gather1d(n, idx):
    buf = jnp.arange(R, dtype=jnp.float32)
    acc = jnp.zeros((W,), jnp.float32)
    return loop(n, lambda s,i: s + buf[(idx+i)%R], acc)
def gather512(n, idx):
    buf = jnp.ones((16384,512), jnp.float32)
    acc = jnp.zeros((W,512), jnp.float32)
    return loop(n, lambda s,i: s + buf[(idx+i)%16384], acc)
def rowscatter4(n, idx):
    buf = jnp.zeros((R+W,4), jnp.int32)
    vals4 = jnp.ones((W,4), jnp.int32)
    return loop(n, lambda s,i: s.at[(idx+i)%R].set(vals4, unique_indices=True), buf)
def scatter1d(n, idx):
    buf = jnp.zeros((R+W,), jnp.float32)
    vals1 = jnp.ones((W,), jnp.float32)
    return loop(n, lambda s,i: s.at[(idx+i)%R].set(vals1, unique_indices=True), buf)
def scatter_small(n, idx):
    buf = jnp.zeros((W,), jnp.float32)
    pos = (idx % W).astype(jnp.int32)
    return loop(n, lambda s,i: s.at[(pos+i)%W].set(1.0+i, unique_indices=True), buf)
def cumsum_w(n, idx):
    acc = jnp.zeros((W,), jnp.int32)
    return loop(n, lambda s,i: s + jnp.cumsum((idx+i)%2), acc)
for name, fn in [("empty",empty),("gather1d",gather1d),("gather512",gather512),
                 ("rowscatter4_1M",rowscatter4),("scatter1d_1M",scatter1d),
                 ("scatter_small_W",scatter_small),("cumsum_W",cumsum_w)]:
    timed(name, fn, idx0)
