"""Pair-payload gather with a TPU-fast custom VJP.

Forward: ``pair_payload = fields_ext[:, pair_splat]`` — one multi-row gather
(the cheap direction on TPU).  Backward under plain autodiff would be a
16-row scatter-add (``~410 ms`` at 4M pairs); the custom VJP instead

  1. permutes per-pair gradients from payload layout to **expansion order**
     (pairs grouped by owning splat — one 16-row gather with fill; dropped
     pairs contribute exact zeros), using ``BinnedPairs.dest_of_exp``;
  2. segment-reduces contiguous per-splat runs with the MXU one-hot kernel
     (``ops/pallas/segsum.py``) — ``~10×`` faster end to end.

Requires ``bin_splats(..., with_grad_map=True)``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .pallas.composite import C_PAD, C_USED
from .pallas.segsum import segsum_by_splat


def _int0(x):
    """Symbolic-zero cotangent for an integer-dtype primal."""
    return np.zeros(x.shape, jax.dtypes.float0)


_ROW_MASK = None


def _diff_row_mask():
    """(16, 1) mask selecting the differentiable payload rows 0..9."""
    global _ROW_MASK
    if _ROW_MASK is None:
        m = np.zeros((C_PAD, 1), np.float32)
        m[:C_USED] = 1.0
        _ROW_MASK = m
    return _ROW_MASK


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gather_pairs(
    fields_ext: jnp.ndarray,    # (10, N+1) f32 — payload rows 0..9 + zero col
    pair_splat: jnp.ndarray,    # (P_pad,) int32
    dest_of_exp: jnp.ndarray,   # (budget,) int32
    exp_offsets: jnp.ndarray,   # (N,) int32
    exp_counts: jnp.ndarray,    # (N,) int32
    interpret: bool = False,
) -> jnp.ndarray:
    """Gather the (10, P_pad) pair payload; differentiable w.r.t. fields."""
    return fields_ext[:, pair_splat]


def _fwd(fields_ext, pair_splat, dest_of_exp, exp_offsets, exp_counts, interpret):
    out = fields_ext[:, pair_splat]
    return out, (pair_splat, dest_of_exp, exp_offsets, exp_counts)


def _bwd(interpret, res, g):
    pair_splat, dest_of_exp, exp_offsets, exp_counts = res
    # payload layout → expansion order; dropped pairs (dest == p_pad) fill 0.
    d_exp = jnp.take(g, dest_of_exp, axis=1, mode="fill", fill_value=0.0)
    d_fields = segsum_by_splat(d_exp, exp_offsets, exp_counts, interpret)
    # zero the metadata rows (row 15 carries the segsum's cid reduction) and
    # re-append the sentinel column to match the (16, N+1) primal shape.
    d_fields = d_fields * _diff_row_mask()
    d_fields_ext = jnp.pad(d_fields, ((0, 0), (0, 1)))
    return (
        d_fields_ext,
        _int0(pair_splat),
        _int0(dest_of_exp),
        _int0(exp_offsets),
        _int0(exp_counts),
    )


gather_pairs.defvjp(_fwd, _bwd)
