"""Cost of cumsum/cummax scans and scatters at binning scale on the chip."""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

P = 3_000_000
N = 1_000_000
x = jnp.ones((P,), jnp.int32)
xi = jax.random.randint(jax.random.PRNGKey(0), (N,), 0, P, dtype=jnp.int32)
vals = jnp.arange(N, dtype=jnp.int32)

def probe(r):
    float(jax.tree.leaves(r)[0].ravel()[0])

def timeit(name, fn, *args, iters=5):
    jf = jax.jit(fn); r = jf(*args); probe(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = jf(*args)
    probe(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")

timeit("cummax int32 3M", lambda a: jax.lax.cummax(a), x)
timeit("cumsum int32 3M", lambda a: jnp.cumsum(a), x)
timeit("cumsum int32 1M", lambda a: jnp.cumsum(a), x[:N])
timeit("scatter-max 1M into 3M", lambda v, i: jnp.zeros((P,), jnp.int32).at[i].max(v, mode="drop"), vals, xi)
timeit("scatter-set 1M into 1M", lambda v, i: jnp.zeros((N,), jnp.int32).at[i % N].set(v, mode="drop"), vals, xi)
timeit("scatter-set 3M into 3M", lambda i: jnp.zeros((P,), jnp.int32).at[jnp.arange(P, dtype=jnp.int32)].set(i, mode="drop"), x)
timeit("sort 1 int32 3M", lambda a: jax.lax.sort(a), xi if False else jnp.tile(xi, 3))
timeit("gather 2040-table by 3M dup queries", lambda t, q: t[q % 2040], vals[:2048], jnp.tile(xi, 3)[:P])
