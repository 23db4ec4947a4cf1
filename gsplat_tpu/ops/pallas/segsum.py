"""Pallas segmented column-sum: per-pair gradients → per-splat gradients.

The VJP of the pair-payload gather ``payload = fields[:, pair_splat]`` is a
segment reduction: every splat's gradient is the sum of its pairs' gradient
columns.  XLA lowers that as ``zeros.at[:, pair_splat].add(d_payload)`` — a
16-row scatter-add that costs ~410 ms at 4M pairs on TPU (scatters process
one index per cycle-ish).  This kernel does the same reduction in a few ms:

* pairs are first permuted to **expansion order** (grouped by splat,
  contiguous segments — one 16-row gather through ``BinnedPairs.dest_of_exp``,
  see the ``composite_splats_pallas`` VJP in ``ops/pallas/composite.py``);
* splats with ≥1 pair get dense **compact ids**; each grid program owns a
  block of B compact splats and walks its pair window in C-pair chunks;
* within a chunk the ragged per-splat reduction is a single MXU matmul
  against a one-hot membership matrix built on the fly:
  ``acc (16,B) += d_chunk (16,C) ×_C onehotᵀ (B,C)`` where
  ``onehotᵀ[i,j] = [cid_j == block_base + i]``.  Chunks at window edges
  overlap neighbouring blocks' pairs; the compare simply zeroes them, so no
  masking or alignment fixups are needed.

The per-pair compact id rides as an **extra payload row** (exact in f32
below 2^24), keeping pairs on the lane axis end to end: a separate integer
side array would need either a lane→sublane relayout in-kernel or a (P, 1)
layout that Mosaic pads 128× in HBM.

Accumulation order within a splat is the fixed chunk-major order — bit-wise
deterministic for a given binning, independent of device count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

C_SS = 16    # kernel payload rows: moment sums (0..8) + cid carrier (row 9)
             # + zero fill (Mosaic DMA slices must be 8-aligned on sublanes).
ROW_CID = 9  # payload row carrying the per-pair compact splat id (f32)
BLK = 512    # compact splats per grid program (large: the per-grid-step
             # overhead dominates at small blocks — 7.8k programs at BLK=128
             # cost ~8 ms of pure sequencing at 1M splats)
CHK = 256    # pairs per DMA chunk


def _segsum_kernel(
    bstart_ref,   # (nblocks+1,) int32 scalar-prefetch: pair window per block
    dpay_ref,     # (C_SS, Pq) f32 HBM — per-pair gradients, expansion order;
                  # row 15 = compact splat id (f32)
    out_ref,      # (C_SS, BLK) VMEM block — per-compact-splat sums
    buf,          # (2, C_SS, CHK) f32 VMEM scratch
    sem,
):
    p = pl.program_id(0)
    w0 = bstart_ref[p]
    w1 = bstart_ref[p + 1]
    c0 = w0 // CHK
    nchunks = jnp.where(w1 > w0, pl.cdiv(w1, CHK) - c0, 0)

    def dma(slot, ci):
        off = pl.multiple_of((c0 + ci) * CHK, CHK)
        return pltpu.make_async_copy(
            dpay_ref.at[:, pl.ds(off, CHK)], buf.at[slot], sem.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    iota_bc = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK, CHK), 0) + p * BLK
    ).astype(jnp.float32)

    def body(ci, acc):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nchunks)
        def _():
            dma(1 - slot, ci + 1).start()

        dma(slot, ci).wait()

        cid_row = buf[slot, ROW_CID : ROW_CID + 1, :]         # (1, CHK)
        onehot_t = (cid_row == iota_bc).astype(jnp.bfloat16)  # (BLK, CHK), exact

        # Manual bf16x3 split of the gradient operand: the MXU truncates f32
        # operands to bf16 at DEFAULT precision, corrupting the sums on real
        # silicon (caught on-chip by scripts/verify_tpu.py; interpreter-mode
        # tests compute exact f32 and can't see it).  Three bf16 terms carry
        # all 24 mantissa bits; each matmul's products are exact (×0/1) and
        # accumulate in f32.  Mosaic rejects per-operand precision and
        # uniform HIGHEST would split the 0/1 side too (9 passes, not 3).
        g = buf[slot]
        g1 = g.astype(jnp.bfloat16)
        r1 = g - g1.astype(jnp.float32)
        g2 = r1.astype(jnp.bfloat16)
        g3 = (r1 - g2.astype(jnp.float32)).astype(jnp.bfloat16)
        dn = (((1,), (1,)), ((), ()))
        part = (
            jax.lax.dot_general(g1, onehot_t, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(g2, onehot_t, dn, preferred_element_type=jnp.float32)
            + jax.lax.dot_general(g3, onehot_t, dn, preferred_element_type=jnp.float32)
        )  # (C_PAD, BLK)
        return acc + part

    acc = jax.lax.fori_loop(
        0, nchunks, body, jnp.zeros((C_SS, BLK), jnp.float32)
    )
    out_ref[...] = acc


@functools.lru_cache(maxsize=32)
def _build_segsum(nblocks: int, p_q: int, interpret: bool):
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (C_SS, BLK), lambda p, *_: (0, p), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, C_SS, CHK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((C_SS, nblocks * BLK), jnp.float32),
        interpret=interpret,
    )


def segsum_by_splat(
    d_exp: jnp.ndarray,      # (ROW_CID, budget) f32 — pair rows, expansion order
    exp_offsets: jnp.ndarray,  # (N,) int32 — rank r's pairs at [off, off+cnt)
    exp_counts: jnp.ndarray,   # (N,) int32 — indexed by depth rank
    interpret: bool = False,
    order: jnp.ndarray = None,  # (N,) int32 — storage index of rank r
) -> jnp.ndarray:
    """Sum pair columns per splat.  Returns (C_SS, N) f32 (rows ≥ ROW_CID
    carry the cid reduction / zero fill).

    Expansion order groups pairs by *depth rank*; with ``order`` (the depth
    permutation) the result is returned in **storage order** — one packed
    int32 scatter through the permutation, instead of un-permuting the whole
    10-row gradient matrix."""
    n = exp_offsets.shape[0]
    budget = d_exp.shape[1]
    total = jnp.minimum(
        (exp_offsets[-1] + exp_counts[-1]) if n > 0 else jnp.int32(0), budget
    )

    # Compact ids: rank of each pair-owning splat among splats with ≥1
    # materialised pair.  Built with tiny scatters + one linear cumsum — no
    # per-pair gathers.
    nonzero = (exp_counts > 0) & (exp_offsets < budget)
    seg_marks = jnp.zeros((budget,), jnp.int32).at[
        jnp.where(nonzero, exp_offsets, budget)
    ].set(1, mode="drop")
    cid_pair = jnp.cumsum(seg_marks) - 1
    cid_pair = jnp.where(
        jnp.arange(budget, dtype=jnp.int32) < total, cid_pair, -1
    )
    cid_splat = jnp.cumsum(nonzero.astype(jnp.int32)) - 1  # (N,)

    nblocks = -(-n // BLK)
    # Pair-window table per block: coff[c] = first pair of compact splat c
    # (total for c ≥ #compact splats), subsampled at block boundaries.
    coff = jnp.full((nblocks * BLK + 1,), total, jnp.int32).at[
        jnp.where(nonzero, cid_splat, nblocks * BLK + 1)
    ].set(exp_offsets, mode="drop")
    bstart = coff[::BLK]  # (nblocks+1,)

    # Append the cid as an extra payload row (exact in f32: cid < 2^24) and
    # pad the pair axis to the DMA chunk size (padding cid −1 never matches
    # any block).
    p_q = -(-budget // CHK) * CHK
    cid_f = cid_pair.astype(jnp.float32)
    if p_q != budget:
        d_exp = jnp.pad(d_exp, ((0, 0), (0, p_q - budget)))
        cid_f = jnp.pad(cid_f, (0, p_q - budget), constant_values=-1.0)
    d_exp = jnp.concatenate(
        [
            d_exp,
            cid_f[None, :],
            jnp.zeros((C_SS - ROW_CID - 1, p_q), jnp.float32),
        ],
        axis=0,
    )

    call = _build_segsum(nblocks, p_q, interpret)
    d_comp = call(bstart, d_exp)  # (C_SS, nblocks*BLK)

    if order is not None:
        # cid/nonzero are rank-indexed; route them to storage order with ONE
        # packed int32 scatter through the permutation (cid+1 ≥ 0 so the
        # shift never underflows), then take in storage order directly.
        packed = ((cid_splat + 1) << 1) | nonzero.astype(jnp.int32)
        packed_o = jnp.zeros((n,), jnp.int32).at[order].set(packed)
        nonzero = (packed_o & 1) == 1
        cid_splat = (packed_o >> 1) - 1

    # Gather the payload rows in ONE op (the gather unit fetches all ≤16
    # sublanes of a query together — splitting pays the per-query cost twice;
    # scripts/profile_tail.py); rows ≥ ROW_CID of the kernel output carry the
    # cid reduction / zero fill.
    cid_q = jnp.maximum(cid_splat, 0)
    d = jnp.take(d_comp[:ROW_CID], cid_q, axis=1)
    return jnp.where(nonzero[None, :], d, 0.0)
