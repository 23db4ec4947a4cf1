"""Cost model: gather/scatter variants at binning scale on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

N = 1_000_000
P = 4_000_000

key = jax.random.PRNGKey(0)
idx_small = jax.random.randint(key, (P,), 0, N, dtype=jnp.int32)   # P queries into N
idx_perm = jax.random.permutation(key, jnp.arange(P, dtype=jnp.int32))
src1 = jnp.arange(N, dtype=jnp.float32)
src16 = jnp.zeros((16, N), jnp.float32) + jnp.arange(N, dtype=jnp.float32)
src4 = src16[:4]
pay16 = jnp.zeros((16, P), jnp.float32) + 1.0
tiny = jnp.arange(2048, dtype=jnp.int32)
idx_tiny = idx_small % 2048


def probe(r):
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(r):
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    float(acc)


def timeit(name, fn, *args, iters=5):
    jf = jax.jit(fn)
    r = jf(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*args)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.2f} ms")


timeit("gather 1-row  (P q into N)", lambda i: src1[i], idx_small)
timeit("gather 1-row  (P q into tiny 2k)", lambda i: tiny[i], idx_tiny)
timeit("gather 4-row  (P q into (4,N))", lambda i: src4[:, i], idx_small)
timeit("gather 16-row (P q into (16,N))", lambda i: src16[:, i], idx_small)
timeit("gather 16-row transposed ((N,16) src)", lambda i: src16.T[i], idx_small)
timeit("gather 16-row (P q into (16,P))", lambda i: pay16[:, i % P], idx_perm)
timeit("scatter 1-row set (P into P)", lambda i: jnp.zeros((P,), jnp.float32).at[i].set(1.0, mode="drop"), idx_perm)
timeit("scatter 16-row set ((16,P) cols)", lambda i: jnp.zeros((16, P), jnp.float32).at[:, i].set(pay16, mode="drop"), idx_perm)
timeit("scatter-add 16-row into (16,N)", lambda i: jnp.zeros((16, N), jnp.float32).at[:, i].add(pay16, mode="drop"), idx_small)
timeit("scatter 2k vals into P + cummax", lambda s: jax.lax.cummax(jnp.zeros((P,), jnp.int32).at[s].max(tiny, mode="drop")), jnp.sort(jax.random.randint(key, (2048,), 0, P, dtype=jnp.int32)))
timeit("cumsum P f32", lambda x: jnp.cumsum(x), jnp.ones((P,), jnp.float32))
timeit("sort P (1 key i32)", lambda x: jax.lax.sort(x), idx_small)
timeit("sort P (key+1 payload)", lambda x, y: jax.lax.sort((x, y), num_keys=1, is_stable=True), idx_small, idx_perm)
timeit("sort P (key+2 payload)", lambda x, y, z: jax.lax.sort((x, y, z), num_keys=1, is_stable=True), idx_small, idx_perm, idx_perm)
# segment-sum style: cumsum (16,P) along axis 1 + boundary gather
timeit("cumsum (16,P) axis1", lambda x: jnp.cumsum(x, axis=1), pay16)
idxN = jax.random.randint(key, (N,), 0, P, dtype=jnp.int32)
timeit("gather 16-row (N q into (16,P))", lambda i: pay16[:, i], idxN)
