"""Trainable splat parameterization.

Optimization runs in an unconstrained space (the same re-parameterization the
3DGS PLY format implies and the reference's hip-file VEX inverts — SURVEY.md
§2 "Example scene"):

  * ``log_scale``      — ``scale = exp(log_scale)`` (positivity)
  * ``logit_opacity``  — ``opacity = sigmoid(logit_opacity)`` ((0, 1))
  * ``quat``           — unnormalized; normalized at use (unit constraint)
  * ``pos``, ``color``, ``sh`` — raw

Same transposed SoA layout as :class:`GaussianSplats` (components × splats).
Gradients flow through the activations into the unconstrained parameters.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.splats import GaussianSplats


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SplatParams:
    pos: jax.Array            # (3, N)
    quat: jax.Array           # (4, N) xyzw, unnormalized
    log_scale: jax.Array      # (3, N)
    logit_opacity: jax.Array  # (N,)
    color: jax.Array          # (3, N)
    sh: jax.Array             # (45, N)

    @property
    def count(self) -> int:
        return self.pos.shape[-1]


def params_from_splats(splats: GaussianSplats, eps: float = 1e-6) -> SplatParams:
    op = jnp.clip(splats.opacity, eps, 1.0 - eps)
    return SplatParams(
        pos=splats.pos,
        quat=splats.orient,
        log_scale=jnp.log(jnp.maximum(splats.scale, eps)),
        logit_opacity=jnp.log(op / (1.0 - op)),
        color=splats.color,
        sh=splats.sh,
    )


def splats_from_params(params: SplatParams) -> GaussianSplats:
    norm = jnp.sqrt(jnp.maximum(jnp.sum(params.quat * params.quat, axis=0, keepdims=True), 1e-24))
    return GaussianSplats(
        pos=params.pos,
        orient=params.quat / norm,
        scale=jnp.exp(params.log_scale),
        opacity=jax.nn.sigmoid(params.logit_opacity),
        color=params.color,
        sh=params.sh,
    )
