"""Calibrate the device constants behind the speed-of-light model
(gsplat_tpu/utils/sol.py) on the current chip.

Each microbench measures the PEAK achievable rate of one hardware unit with
the access pattern our pipeline actually uses; the constants are recorded in
sol.py with this script as their provenance.  Run on the real chip:

    python scripts/sol_calibrate.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(name, f, *args, iters=20):
    g = jax.jit(f)
    r = g(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    for _ in range(3):
        r = g(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(*args)
    float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:46s} {dt*1e3:8.3f} ms")
    return dt


def vpu_rate():
    """Peak f32 vreg-op retire rate: a long unrolled FMA chain with 8-way
    ILP on (8, 512) operands, no memory traffic inside the loop."""
    STEPS, LANES, ILP = 512, 512, 8

    def kernel(x_ref, o_ref):
        accs = [x_ref[:] * (1.0 + 0.001 * k) for k in range(ILP)]
        def body(i, accs):
            return tuple(a * 1.0000001 + 0.0000001 for a in accs)
        accs = jax.lax.fori_loop(0, STEPS, body, tuple(accs))
        o_ref[:] = sum(accs)

    x = jnp.ones((8, LANES), jnp.float32)
    f = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, LANES), jnp.float32),
    )
    dt = timeit("VPU fma chain", f, x, iters=50)
    # each loop step: ILP ops on (8, LANES) = ILP * LANES/128 vregs; fma+add
    # counted as 2 vector ops per element-pass
    vregs = STEPS * ILP * (LANES // 128) * 2
    rate = vregs / dt
    print(f"  -> {rate/1e9:.2f} G vreg-ops/s ({rate*1024/1e12:.2f} T lane-ops/s)")
    return rate


def gather_rate():
    """Peak row-gather element rate: 8-row int32 gather, nearly-sorted
    queries (the pipeline's best shape — one sublane group, depth-rank
    locality)."""
    n, p = 1 << 20, 2_359_296
    rows = jnp.ones((8, n), jnp.int32)
    q = jnp.sort(jax.random.randint(jax.random.PRNGKey(0), (p,), 0, n, jnp.int32))
    dt = timeit("8-row gather, 2.36M sorted queries", lambda r, i: r[:, i], rows, q)
    rate = 8 * p / dt
    print(f"  -> {rate/1e9:.2f} G element-fetches/s")
    return rate


def sort_rate():
    """XLA int32 key+payload sort rate at the binning's problem size."""
    p = 2_359_296
    k = jax.random.randint(jax.random.PRNGKey(0), (p,), 0, 2**30, jnp.int32)
    v = jnp.arange(p, dtype=jnp.int32)
    dt = timeit("(key, payload) sort 2.36M", lambda a, b: jax.lax.sort((a, b), num_keys=1), k, v)
    print(f"  -> {p/dt/1e6:.1f} M elements/s")
    return p / dt


def hbm_bw():
    """Streaming HBM bandwidth: big copy (read + write)."""
    x = jnp.ones((256 * 1024 * 1024 // 4,), jnp.float32)  # 256 MB
    dt = timeit("256MB copy", lambda a: a + 1.0, x, iters=10)
    bw = 2 * x.size * 4 / dt
    print(f"  -> {bw/1e9:.0f} GB/s (r+w)")
    return bw


if __name__ == "__main__":
    vpu_rate()
    gather_rate()
    sort_rate()
    hbm_bw()
