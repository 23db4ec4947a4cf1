"""Round-5 experiment (VERDICT r4 item 1): can the forward kernel gather its
own payload per chunk by indexed DMA through ``pair_splat`` scalar-prefetch,
deleting the XLA ``_gather_payload`` (~21 ms at 1M/1080p)?

The question reduces to the per-pair DMA issue+completion rate: a pair's
payload is one (16, 1) f32 column of the HBM field matrix at a
data-dependent index (depth-rank queries have NO chunk locality — a tile's
128-pair chunk spans ~95k columns at 1M splats, so ranged copies are out).
This kernel measures exactly that: per 128-pair chunk, issue 128 single-
column DMAs driven by a scalar-prefetch index array, wait for all, reduce.
Compared against (a) the XLA 10-row gather it would replace and (b) the
contiguous (16, chunk) chunk DMA the production kernel does today.

Also measures the write direction at (16, 1) granularity — the same rate
bounds experiment (b), expansion-order per-pair gradient writes.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C = 16
CHUNK = 128


def _percol_kernel(idx_ref, payload_ref, out_ref, buf, sem, *, nchunks):
    """Per 128-pair chunk: 128 single-column (16, 1) DMAs, then reduce.

    REFUTED AT COMPILE TIME: Mosaic requires HBM slices 128-aligned on the
    lane dim ("Slice shape along dimension 1 must be aligned to tiling
    (128), but is 1") — per-pair granularity is inexpressible, in either
    direction (same check applies to scattered writes).  Kept for the
    record; ``--percol`` runs it to reproduce the compile error.
    """

    def chunk_body(ci, acc):
        pos0 = ci * CHUNK

        def start_one(u, _):
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(idx_ref[pos0 + u], 1)],
                buf.at[:, pl.ds(u, 1)],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, start_one, 0)

        def wait_one(u, _):
            pltpu.make_async_copy(
                payload_ref.at[:, pl.ds(idx_ref[pos0 + u], 1)],
                buf.at[:, pl.ds(u, 1)],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_one, 0)
        return acc + jnp.sum(buf[:, :])

    out_ref[0, 0] = jax.lax.fori_loop(0, nchunks, chunk_body, jnp.float32(0))


def _perblock_kernel(idx_ref, payload_ref, out_ref, buf, sem, *, nchunks):
    """Issue-rate bound: one ALIGNED (8, 128) block DMA per pair (the finest
    HBM granularity Mosaic can address), fetching the block containing the
    pair's column.  Measures pure per-DMA issue+completion cost — if even
    this exceeds the XLA gather's ns/pair, per-pair DMA loses at ANY
    expressible granularity (and it also moves 64x the needed bytes)."""

    def chunk_body(ci, acc):
        pos0 = ci * CHUNK

        def one(u, _):
            blk = (idx_ref[pos0 + u] >> 7) << 7
            cp = pltpu.make_async_copy(
                payload_ref.at[0:8, pl.ds(pl.multiple_of(blk, CHUNK), CHUNK)],
                buf.at[0:8],
                sem,
            )
            cp.start()
            cp.wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, one, 0)
        return acc + jnp.sum(buf[:, :])

    out_ref[0, 0] = jax.lax.fori_loop(0, nchunks, chunk_body, jnp.float32(0))


def _chunk_kernel(idx_ref, payload_ref, out_ref, buf, sem, *, nchunks):
    """Baseline: one contiguous (16, CHUNK) DMA per chunk (today's kernel)."""

    def chunk_body(ci, acc):
        cp = pltpu.make_async_copy(
            payload_ref.at[:, pl.ds(pl.multiple_of(ci * CHUNK, CHUNK), CHUNK)],
            buf, sem,
        )
        cp.start()
        cp.wait()
        return acc + jnp.sum(buf[:, :])

    out_ref[0, 0] = jax.lax.fori_loop(0, nchunks, chunk_body, jnp.float32(0))


def _percol_write_kernel(idx_ref, payload_ref, out_ref, buf, sem, *, nchunks):
    """Write direction: per-pair (16, 1) column DMAs VMEM→HBM (scattered)."""
    buf[:, :] = jnp.ones((C, CHUNK), jnp.float32)

    def chunk_body(ci, acc):
        pos0 = ci * CHUNK

        def start_one(u, _):
            pltpu.make_async_copy(
                buf.at[:, pl.ds(u, 1)],
                out_ref.at[:, pl.ds(idx_ref[pos0 + u], 1)],
                sem,
            ).start()
            return 0

        jax.lax.fori_loop(0, CHUNK, start_one, 0)

        def wait_one(u, _):
            pltpu.make_async_copy(
                buf.at[:, pl.ds(u, 1)],
                out_ref.at[:, pl.ds(idx_ref[pos0 + u], 1)],
                sem,
            ).wait()
            return 0

        jax.lax.fori_loop(0, CHUNK, wait_one, 0)
        return acc

    jax.lax.fori_loop(0, nchunks, chunk_body, 0)


def build(kernel, p, n, write=False):
    nchunks = p // CHUNK
    if write:
        out_shape = jax.ShapeDtypeStruct((C, n), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.HBM)
    else:
        out_shape = jax.ShapeDtypeStruct((1, 1), jnp.float32)
        out_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    return pl.pallas_call(
        functools.partial(kernel, nchunks=nchunks),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=out_spec,
            scratch_shapes=[
                pltpu.VMEM((C, CHUNK), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )


def main():
    n = 1 << 20
    p = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 18
    key = jax.random.PRNGKey(0)
    fields = jax.random.normal(key, (C, n), jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (p,), 0, n, jnp.int32)

    def timeit(name, f, *args, iters=5, per_pair=p):
        r = jax.block_until_ready(f(*args))
        float(jnp.asarray(r).ravel()[0])  # force through axon tunnel
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(*args)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name:42s} {dt*1e3:9.2f} ms   {dt/per_pair*1e9:8.2f} ns/pair")
        return dt

    print(f"N={n} P={p} ({p//CHUNK} chunks)")
    timeit("XLA 10-row gather (what it replaces)",
           jax.jit(lambda f, i: f[:10][:, i]), fields, idx)
    timeit("in-kernel contiguous (16,128) chunk DMA",
           jax.jit(build(_chunk_kernel, p, n)), idx, fields)
    timeit("in-kernel per-pair ALIGNED (8,128) block DMA",
           jax.jit(build(_perblock_kernel, p, n)), idx, fields)
    if "--percol" in sys.argv:  # reproduces the Mosaic alignment rejection
        timeit("in-kernel per-pair (16,1) column DMA",
               jax.jit(build(_percol_kernel, p, n)), idx, fields)
        timeit("in-kernel per-pair (16,1) column WRITE",
               jax.jit(build(_percol_write_kernel, p, n, write=True)), idx, fields)


if __name__ == "__main__":
    main()
