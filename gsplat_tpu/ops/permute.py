"""Column permutation with a gather-only custom VJP.

``x[:, perm]`` under plain autodiff transposes to a multi-row scatter-add
(~100 ms at 1M columns on TPU — scatters process ~one index per cycle).  For
a *permutation* the adjoint is itself a permutation: ``dx = g[:, inv_perm]``
— one cheap scatter to build the inverse index plus one multi-row gather.
Used for the global depth sort (``ops/rasterize_tiles.sort_by_depth``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _int0(x):
    return np.zeros(x.shape, jax.dtypes.float0)


@jax.custom_vjp
def permute_cols(x: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """``x[:, perm]`` where ``perm`` is a permutation of ``arange(x.shape[1])``."""
    return x[:, perm]


def _fwd(x, perm):
    return x[:, perm], perm


def _bwd(perm, g):
    n = perm.shape[0]
    inv = jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype)
    )
    return g[:, inv], _int0(perm)


permute_cols.defvjp(_fwd, _bwd)
