"""Pallas 1-D prefix scans (int32 cumsum / cummax) for the binning glue.

XLA lowers a 1-D ``cumsum``/``cummax`` over millions of elements to a
sequence of full-array shifted combines — measured ~3.7-4 ms per scan at
1M-2.4M elements on-chip, and ``bin_splats`` runs FOUR of them per frame
(pair-offset cumsum, the marks cummax, two segment-descriptor cummaxes):
~10 ms of pure scan glue at 1M/1080p.

This kernel walks the array once: the flat array is viewed (R, 128·k) so a
block of 8 rows is 8·128·k consecutive elements in row-major layout; a
block's inclusive prefix runs entirely in vregs (log₂ lane shifts via
``pltpu.roll`` + masked combine, then a 3-step sublane pass on the row
totals), and blocks chain through one (8, 1) carry — a single sequential
grid-free loop with double-buffered in/out DMA.  Integer adds/maxes are
exact in any association order, so results are bit-identical to
``jnp.cumsum``/``lax.cummax`` (asserted in tests/test_pallas_composite.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C = 512              # lanes per block row group (4 vregs wide)
_G = 8                # (8, _C) sub-blocks chained per DMA round: the scan
                      # compute is ~100 vreg ops per sub-block (~tens of ns),
                      # so a one-sub-block loop is pure DMA round-trip
                      # latency (~5 µs/block, measured 3.2 ms at 2.36M —
                      # no faster than XLA); amortizing 8 sub-blocks per
                      # 128 KB DMA cuts the rounds 8×
_BLOCK = 8 * _C * _G  # elements per DMA round
_NEG_INF_I32 = -(2**31)


def _combine(kind, a, b):
    return a + b if kind == "add" else jnp.maximum(a, b)


def _scan_block(blk, kind):
    """Inclusive row-major prefix of one (8, C) int32 block, in-register."""
    c = blk.shape[1]
    li = jax.lax.broadcasted_iota(jnp.int32, blk.shape, 1)
    neutral = 0 if kind == "add" else _NEG_INF_I32
    v = blk
    sh = 1
    while sh < c:
        r = pltpu.roll(v, sh, 1)
        v = _combine(kind, v, jnp.where(li >= sh, r, neutral))
        sh *= 2
    rt = v[:, c - 1 : c]  # (8, 1) row totals
    si = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
    o = rt
    sh = 1
    while sh < 8:
        r = pltpu.roll(o, sh, 0)
        o = _combine(kind, o, jnp.where(si >= sh, r, neutral))
        sh *= 2
    # Block total replicated into EVERY row of an (8, 1): Mosaic cannot
    # broadcast a (1, 1) slice (two-axis broadcast / offset relayout), but
    # (8, 1) → (8, C) is a plain lane broadcast.  Three unmasked
    # rotate-combines make every row the full 8-row reduction (rotation
    # offsets 1+2+4 visit each row exactly once).
    t_all = rt
    sh = 1
    while sh < 8:
        t_all = _combine(kind, t_all, pltpu.roll(t_all, sh, 0))
        sh *= 2
    # o = inclusive row-prefix of totals; shift to exclusive and fold in.
    if kind == "add":
        return v + (o - rt), t_all
    excl = jnp.where(si >= 1, pltpu.roll(o, 1, 0), _NEG_INF_I32)
    return jnp.maximum(v, excl), t_all


def _scan_kernel(x_ref, out_ref, ibuf, obuf, isem, osem, *, nblocks, kind):
    rows = 8 * _G

    def dma_in(slot, b):
        return pltpu.make_async_copy(
            x_ref.at[pl.ds(rows * b, rows), :], ibuf.at[slot], isem.at[slot]
        )

    def dma_out(slot, b):
        return pltpu.make_async_copy(
            obuf.at[slot], out_ref.at[pl.ds(rows * b, rows), :], osem.at[slot]
        )

    dma_in(0, 0).start()
    neutral = jnp.full((8, 1), 0 if kind == "add" else _NEG_INF_I32, jnp.int32)

    def body(b, carry):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblocks)
        def _():
            dma_in(1 - slot, b + 1).start()

        dma_in(slot, b).wait()

        @pl.when(b >= 2)
        def _():
            dma_out(slot, b - 2).wait()

        for g in range(_G):  # unrolled: _G sub-blocks chained in-register
            scanned, total = _scan_block(ibuf[slot, 8 * g : 8 * g + 8], kind)
            obuf[slot, 8 * g : 8 * g + 8] = _combine(
                kind, scanned, jnp.broadcast_to(carry, scanned.shape)
            )
            carry = _combine(kind, carry, total)
        dma_out(slot, b).start()
        return carry

    jax.lax.fori_loop(0, nblocks, body, neutral)

    @pl.when(nblocks >= 1)
    def _():
        dma_out(jax.lax.rem(nblocks - 1, 2), nblocks - 1).wait()

    @pl.when(nblocks >= 2)
    def _():
        dma_out(jax.lax.rem(nblocks - 2, 2), nblocks - 2).wait()


@functools.lru_cache(maxsize=32)
def _build_scan(nblocks: int, kind: str, interpret: bool):
    return pl.pallas_call(
        functools.partial(_scan_kernel, nblocks=nblocks, kind=kind),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, 8 * _G, _C), jnp.int32),
                pltpu.VMEM((2, 8 * _G, _C), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((8 * _G * nblocks, _C), jnp.int32),
        interpret=interpret,
    )


def _scan1d(x: jnp.ndarray, kind: str, interpret) -> jnp.ndarray:
    assert x.dtype == jnp.int32 and x.ndim == 1
    if interpret is None:
        # Trace-time backend probe: compiled Mosaic on TPU, interpreter on
        # CPU (tests / dev machines) — mirrors scripts/verify_tpu.py.
        interpret = jax.default_backend() == "cpu"
    n = x.shape[0]
    if n < 2 * _BLOCK:  # tiny arrays: XLA's scan is fine and jit-cheap
        return jnp.cumsum(x) if kind == "add" else jax.lax.cummax(x)
    n_pad = -(-n // _BLOCK) * _BLOCK
    if n_pad != n:
        fill = 0 if kind == "add" else _NEG_INF_I32
        x = jnp.concatenate([x, jnp.full((n_pad - n,), fill, jnp.int32)])
    call = _build_scan(n_pad // _BLOCK, kind, interpret)
    return call(x.reshape(-1, _C)).reshape(n_pad)[:n]


def cumsum_i32(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Exact inclusive int32 cumsum — bit-identical to ``jnp.cumsum``."""
    return _scan1d(x, "add", interpret)


def cummax_i32(x: jnp.ndarray, interpret=None) -> jnp.ndarray:
    """Exact inclusive int32 cummax — bit-identical to ``lax.cummax``."""
    return _scan1d(x, "max", interpret)
