"""Gaussian-splat scene data model.

TPU-native replacement for the reference's geometry layers: the custom
``GEO_PrimGsplat`` GA primitive (``gsplat_plugin/src/GEO_GSplat.C:413-431``)
and the ``GSplatSource`` SOP that wraps points into it
(``gsplat_plugin/src/SOP_GSplat.C:93-117``).  Instead of a GA attribute
table, a splat cluster is a JAX pytree of plain arrays — shardable with
``jax.sharding``, differentiable, and directly consumable by jitted render
functions.

Field conventions follow the reference's point-attribute convention
(``src/GR_GSplat.C:233-372``):

* ``pos``      (N, 3)  float32 — world positions (``P``).
* ``orient``   (N, 4)  — quaternion in **xyzw** order (``orient``).
* ``scale``    (N, 3)  — per-axis standard deviations (``scale``).
* ``opacity``  (N,)    — post-sigmoid opacity (``opacity`` | ``Alpha``).
* ``color``    (N, 3)  — DC base color, ``sh0·SH_C0 + 0.5`` pre-baked (``Cd``).
* ``sh``       (N, 15, 3) — band 1-3 SH coefficients, ``sh1..sh15`` order.

Missing-attribute defaults mirror the reference's degrade-don't-crash policy
(``src/GR_GSplat.C:309-312``): color (0,0,0), opacity 1, unit scale, identity
orientation, zero SH.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

SH_REST_COEFFS = 15  # bands 1..3 (3DGS degree-3)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GaussianSplats:
    """A cluster of N Gaussian splats (the pytree analogue of one GSplat prim)."""

    pos: jax.Array       # (N, 3)
    orient: jax.Array    # (N, 4) xyzw
    scale: jax.Array     # (N, 3)
    opacity: jax.Array   # (N,)
    color: jax.Array     # (N, 3)
    sh: jax.Array        # (N, 15, 3)

    @property
    def count(self) -> int:
        return self.pos.shape[0]

    def astype(self, dtype) -> "GaussianSplats":
        """Cast all fields except positions (kept fp32, mirroring the
        reference's precision policy: pos fp32, rest fp16 —
        ``include/GR_GSplat.h:120-127``)."""
        return GaussianSplats(
            pos=self.pos,
            orient=self.orient.astype(dtype),
            scale=self.scale.astype(dtype),
            opacity=self.opacity.astype(dtype),
            color=self.color.astype(dtype),
            sh=self.sh.astype(dtype),
        )

    def validate(self) -> "GaussianSplats":
        """Shape/dtype validation (the checking the reference SOP skips —
        "Assume all points are good", ``src/GEO_GSplat.C:417-418`` — and that
        the GR layer then has to error-log at extraction)."""
        n = self.pos.shape[0]
        expect = {
            "pos": (n, 3),
            "orient": (n, 4),
            "scale": (n, 3),
            "opacity": (n,),
            "color": (n, 3),
            "sh": (n, SH_REST_COEFFS, 3),
        }
        for name, shape in expect.items():
            got = getattr(self, name).shape
            if got != shape:
                raise ValueError(f"GaussianSplats.{name}: expected shape {shape}, got {got}")
        return self

    def concat(self, other: "GaussianSplats") -> "GaussianSplats":
        """Concatenate two clusters (the reference's multi-detail aggregation,
        ``src/GSplatRenderer.C:420-447``)."""
        return jax.tree.map(lambda a, b: jnp.concatenate([a, b], axis=0), self, other)

    def barycenter(self) -> jax.Array:
        """Mean position (``GEO_PrimGsplat::baryCenter``, ``src/GEO_GSplat.C:339-351``)."""
        return jnp.mean(self.pos, axis=0)

    def bbox(self):
        """(min, max) corners (``getBBox``, ``src/GEO_GSplat.C:327-336``)."""
        return jnp.min(self.pos, axis=0), jnp.max(self.pos, axis=0)


def make_splats(
    pos: Any,
    orient: Optional[Any] = None,
    scale: Optional[Any] = None,
    opacity: Optional[Any] = None,
    color: Optional[Any] = None,
    sh: Optional[Any] = None,
    dtype=jnp.float32,
) -> GaussianSplats:
    """Build a validated :class:`GaussianSplats`, filling reference defaults
    for missing attributes (``src/GR_GSplat.C:309-312``)."""
    pos = jnp.asarray(pos, dtype=jnp.float32)
    n = pos.shape[0]
    if orient is None:
        orient = jnp.tile(jnp.array([0.0, 0.0, 0.0, 1.0], dtype=dtype), (n, 1))
    if scale is None:
        scale = jnp.ones((n, 3), dtype=dtype)
    if opacity is None:
        opacity = jnp.ones((n,), dtype=dtype)
    if color is None:
        color = jnp.zeros((n, 3), dtype=dtype)
    if sh is None:
        sh = jnp.zeros((n, SH_REST_COEFFS, 3), dtype=dtype)
    return GaussianSplats(
        pos=pos,
        orient=jnp.asarray(orient, dtype=dtype),
        scale=jnp.asarray(scale, dtype=dtype),
        opacity=jnp.asarray(opacity, dtype=dtype).reshape(n),
        color=jnp.asarray(color, dtype=dtype),
        sh=jnp.asarray(sh, dtype=dtype),
    ).validate()


def random_splats(
    key: jax.Array,
    n: int,
    extent: float = 1.0,
    scale_range=(0.01, 0.08),
    sh_scale: float = 0.0,
    dtype=jnp.float32,
) -> GaussianSplats:
    """Synthetic-scene generator for tests and benchmarks."""
    k1, k2, k3, k4, k5, k6 = jax.random.split(key, 6)
    pos = jax.random.uniform(k1, (n, 3), minval=-extent, maxval=extent)
    quat = jax.random.normal(k2, (n, 4))
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    scale = jax.random.uniform(k3, (n, 3), minval=scale_range[0], maxval=scale_range[1])
    opacity = jax.random.uniform(k4, (n,), minval=0.3, maxval=1.0)
    color = jax.random.uniform(k5, (n, 3), minval=0.0, maxval=1.0)
    sh = sh_scale * jax.random.normal(k6, (n, SH_REST_COEFFS, 3))
    return make_splats(pos, quat, scale, opacity, color, sh, dtype=dtype)


def to_numpy_dict(splats: GaussianSplats) -> Dict[str, np.ndarray]:
    return {f.name: np.asarray(getattr(splats, f.name)) for f in dataclasses.fields(splats)}
