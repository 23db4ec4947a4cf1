"""Pallas segmented column-sum: per-pair gradients → per-splat gradients.

The VJP of the pair-payload gather ``payload = fields[:, pair_splat]`` is a
segment reduction: every splat's gradient is the sum of its pairs' gradient
columns.  XLA lowers that as ``zeros.at[:, pair_splat].add(d_payload)`` — a
16-row scatter-add that costs ~410 ms at 4M pairs on TPU (scatters process
one index per cycle-ish).  This kernel does the same reduction in a few ms:

* pairs are first permuted to **expansion order** (grouped by depth rank,
  contiguous segments — the 8+2-row gathers through
  ``BinnedPairs.dest_of_exp``, see the ``composite_splats_pallas`` VJP in
  ``ops/pallas/composite.py``);
* each grid program owns a block of B consecutive **depth ranks** and walks
  the pair window ``[exp_offsets[pB], exp_offsets[(p+1)B])`` in C-pair
  chunks — the block table is a strided slice of ``exp_offsets``, so there
  is no compact-id relabeling (an earlier design built dense compact ids
  with two budget-sized scatters + cumsums and undid them with a 9-row
  gather: ~18 ms of pure index plumbing per frame, all deleted by blocking
  on ranks directly — ranks with zero pairs simply never match the one-hot,
  and the kernel output is already rank-indexed so the consumer reads it
  with a free slice);
* within a chunk the ragged per-rank reduction is a single MXU matmul
  against a one-hot membership matrix built on the fly:
  ``acc (8,B) += d_chunk (8,C) ×_C onehotᵀ (B,C)`` where
  ``onehotᵀ[i,j] = [rank_j == block_base + i]``.  Chunks at window edges
  overlap neighbouring blocks' pairs; the compare simply zeroes them, so no
  masking or alignment fixups are needed.

The per-pair rank rides as an **extra payload row** (exact in f32 below
2^24, and max_splats = 2^23), keeping pairs on the lane axis end to end: a
separate integer side array would need either a lane→sublane relayout
in-kernel or a (P, 1) layout that Mosaic pads 128× in HBM.

Accumulation order within a splat is the fixed chunk-major order (chunks on
an absolute C-pair grid) — bit-wise deterministic for a given binning,
independent of device count and of the block partition.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_RANK = 1  # aux payload row carrying the per-pair depth rank (f32; −1 =
              # dropped/padding, which never matches any block's one-hot)
import os

BLK = int(os.environ.get("GSPLAT_SEGSUM_BLK", "512"))
             # ranks per grid program (large: the per-grid-step overhead
             # dominates at small blocks — 7.8k programs at BLK=128 cost
             # ~8 ms of pure sequencing at 1M splats; env knob for on-chip
             # sweeps)
CHK = 256    # pairs per DMA chunk


def _segsum_kernel(
    bstart_ref,   # (nblocks+1,) int32 scalar-prefetch: pair window per block
    d8_ref,       # (8, Pq) f32 HBM — moment rows, expansion order
    aux_ref,      # (2, Pq) f32 HBM — [dp2 row; rank row (f32)]
    out_ref,      # (16, BLK) VMEM block — per-rank sums (rows 0..7 moments,
                  # row 8 dp2, row 9 rank-weighted garbage, 10..15 zero)
    buf8,         # (2, 8, CHK) f32 VMEM scratch
    bufa,         # (2, 2, CHK) f32 VMEM scratch
    sem8,
    sema,
):
    p = pl.program_id(0)
    w0 = bstart_ref[p]
    w1 = bstart_ref[p + 1]
    c0 = w0 // CHK
    nchunks = jnp.where(w1 > w0, pl.cdiv(w1, CHK) - c0, 0)

    def dma8(slot, ci):
        off = pl.multiple_of((c0 + ci) * CHK, CHK)
        return pltpu.make_async_copy(
            d8_ref.at[:, pl.ds(off, CHK)], buf8.at[slot], sem8.at[slot]
        )

    def dmaa(slot, ci):
        off = pl.multiple_of((c0 + ci) * CHK, CHK)
        return pltpu.make_async_copy(
            aux_ref.at[:, pl.ds(off, CHK)], bufa.at[slot], sema.at[slot]
        )

    @pl.when(nchunks > 0)
    def _():
        dma8(0, 0).start()
        dmaa(0, 0).start()

    iota_bc = (
        jax.lax.broadcasted_iota(jnp.int32, (BLK, CHK), 0) + p * BLK
    ).astype(jnp.float32)

    def body(ci, accs):
        acc8, acca = accs
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < nchunks)
        def _():
            dma8(1 - slot, ci + 1).start()
            dmaa(1 - slot, ci + 1).start()

        dma8(slot, ci).wait()
        dmaa(slot, ci).wait()

        rank_row = bufa[slot, ROW_RANK : ROW_RANK + 1, :]     # (1, CHK)
        onehot_t = (rank_row == iota_bc).astype(jnp.bfloat16)  # (BLK, CHK), exact

        # Manual bf16x3 split of the gradient operand: the MXU truncates f32
        # operands to bf16 at DEFAULT precision, corrupting the sums on real
        # silicon (caught on-chip by scripts/verify_tpu.py; interpreter-mode
        # tests compute exact f32 and can't see it).  Three bf16 terms carry
        # all 24 mantissa bits; each matmul's products are exact (×0/1) and
        # accumulate in f32.  Mosaic rejects per-operand precision and
        # uniform HIGHEST would split the 0/1 side too (9 passes, not 3).
        dn = (((1,), (1,)), ((), ()))

        def mxu3(g):
            g1 = g.astype(jnp.bfloat16)
            r1 = g - g1.astype(jnp.float32)
            g2 = r1.astype(jnp.bfloat16)
            g3 = (r1 - g2.astype(jnp.float32)).astype(jnp.bfloat16)
            return (
                jax.lax.dot_general(g1, onehot_t, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(g2, onehot_t, dn, preferred_element_type=jnp.float32)
                + jax.lax.dot_general(g3, onehot_t, dn, preferred_element_type=jnp.float32)
            )

        return acc8 + mxu3(buf8[slot]), acca + mxu3(bufa[slot])

    acc8, acca = jax.lax.fori_loop(
        0,
        nchunks,
        body,
        (jnp.zeros((8, BLK), jnp.float32), jnp.zeros((2, BLK), jnp.float32)),
    )
    out_ref[0:8] = acc8
    out_ref[8:10] = acca  # row 8 = dp2 sums; row 9 = rank-weighted garbage
    out_ref[10:16] = jnp.zeros((6, BLK), jnp.float32)


@functools.lru_cache(maxsize=32)
def _build_segsum(nblocks: int, p_q: int, interpret: bool):
    return pl.pallas_call(
        _segsum_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (16, BLK), lambda p, *_: (0, p), memory_space=pltpu.VMEM
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 8, CHK), jnp.float32),
                pltpu.VMEM((2, 2, CHK), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((16, nblocks * BLK), jnp.float32),
        interpret=interpret,
    )


def pad_pairs(budget: int) -> int:
    """Padded pair-axis length the segsum kernel DMAs expect."""
    return -(-budget // CHK) * CHK


def segsum_by_splat(
    d8: jnp.ndarray,         # (8, P_q) f32 — moment rows, expansion order
    aux: jnp.ndarray,        # (2, P_q) f32 — [dp2 row; rank row (−1 = dropped)]
    exp_offsets: jnp.ndarray,  # (N,) int32 — rank r's pairs at [off, off+cnt)
    exp_counts: jnp.ndarray,   # (N,) int32 — indexed by depth rank
    interpret: bool = False,
    order: jnp.ndarray = None,  # (N,) int32 — storage index of rank r
) -> jnp.ndarray:
    """Sum pair columns per splat.  Returns (9, N) f32 — rows 0..7 are the
    per-rank sums of ``d8``, row 8 the sum of the dp2 row — indexed by depth
    rank, or by storage index when ``order`` is given.

    The pair axis of both inputs must already be padded to a multiple of
    ``CHK`` (``pad_pairs``) with rank −1 on padding columns — the caller's
    gathers emit padded arrays directly (padding the query vector is free;
    padding the gathered matrix would copy ~100 MB).
    """
    n = exp_offsets.shape[0]
    p_q = d8.shape[1]
    total = jnp.minimum(
        (exp_offsets[-1] + exp_counts[-1]) if n > 0 else jnp.int32(0), p_q
    )

    # Pair window per rank block: a strided slice of the rank-indexed offset
    # table (clamped: offsets beyond a truncated budget exceed it).
    nblocks = -(-n // BLK)
    bstart = jnp.minimum(
        jnp.concatenate([exp_offsets[::BLK], total[None]]), total
    ).astype(jnp.int32)

    call = _build_segsum(nblocks, p_q, interpret)
    d_comp = call(bstart, d8, aux)  # (16, nblocks*BLK), rank-indexed

    m = d_comp[:9, :n]
    if order is not None:
        # Rank → storage order: invert the depth permutation with one small
        # scatter, then take columns through it (the consumer needs storage
        # order so gradients line up with parameter storage).
        inv = jnp.zeros((n,), jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32)
        )
        m = jnp.take(m, inv, axis=1)
    return m
