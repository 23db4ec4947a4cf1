"""Primitive cost model: scatter/gather/cummax/cumsum at binning sizes."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 4_000_000
N = 1_000_000

key = jax.random.PRNGKey(0)
offsets = jnp.sort(jax.random.randint(key, (N,), 0, B, dtype=jnp.int32))
vals = jnp.arange(N, dtype=jnp.int32)
idx4m = jax.random.randint(key, (B,), 0, N, dtype=jnp.int32)
idx4m_sorted = jnp.sort(idx4m)
big = jnp.arange(B, dtype=jnp.int32)
table1 = jnp.arange(N, dtype=jnp.int32)
table3 = jnp.stack([table1, table1 + 1, table1 + 2])
table16 = jnp.broadcast_to(table1, (16, N)).astype(jnp.float32)


def probe(r):
    float(jnp.sum(r.ravel()[:1].astype(jnp.float32)))


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    r = f(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    probe(r)
    print(f"{name:44s} {(time.perf_counter() - t0) / iters * 1000:9.2f} ms")


timeit("scatter-max 1M vals -> 4M arr", lambda o, v: jnp.zeros((B,), jnp.int32).at[o].max(v, mode="drop"), offsets, vals)
timeit("cummax 4M", lambda x: jax.lax.cummax(x), big)
timeit("cumsum 4M", lambda x: jnp.cumsum(x), big)
timeit("cumsum 1M", lambda x: jnp.cumsum(x), vals)
timeit("chain: scatter-max + cummax", lambda o, v: jax.lax.cummax(jnp.zeros((B,), jnp.int32).at[o].max(v, mode="drop")), offsets, vals)
timeit("3 chains fused", lambda o, v: jax.lax.cummax(jnp.zeros((B,), jnp.int32).at[o].max(v, mode="drop"))
       + jax.lax.cummax(jnp.zeros((B,), jnp.int32).at[o].max(v + 1, mode="drop"))
       + jax.lax.cummax(jnp.zeros((B,), jnp.int32).at[o].max(v + 2, mode="drop")), offsets, vals)
timeit("gather 1-row 4M random queries", lambda i: table1[i], idx4m)
timeit("gather 1-row 4M sorted queries", lambda i: table1[i], idx4m_sorted)
timeit("gather 3-row 4M queries", lambda i: table3[:, i], idx4m)
timeit("gather 16-row f32 4M queries", lambda i: table16[:, i], idx4m)
timeit("scatter 4M -> 4.26M set", lambda d, v: jnp.zeros((B + 260096,), jnp.int32).at[d].set(v, mode="drop"), big, big)
timeit("where+iota 4M (baseline elementwise)", lambda x: jnp.where(x > 2, x + 1, x), big)
