"""Reference (oracle) rasterizer: unfused, per-pixel, runs anywhere.

A direct, *independent* transcription of the reference's GPU pipeline
(SURVEY.md §3.5) as a single differentiable ``lax.scan`` over splats in
global depth order:

  * sort: ascending squared world distance to camera — the reference's CPU
    argsort (``gsplat_plugin/src/GSplatRenderer.C:176-216``);
  * fragment: quad-basis coordinates (qx, qy) with footprint |q|≤2, falloff
    ``α = exp(−(qx²+qy²))·opacity`` clamped then cut at 1/255
    (``shaders/GSplatShaderSource.h:304-311`` + quad extent ±2 from
    ``:168-188``);
  * blend: front-to-back "under" operator — GL blendfunc
    (ONE_MINUS_DST_ALPHA, ONE) — ``C += rgb·α·(1−A); A += α·(1−A)``
    (``src/GSplatRenderer.C:615-621``), premultiplied output.

O(N·H·W) — this is the ground truth for image and gradient tests
(BASELINE.json config 1), not a production path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.camera import Camera
from ..models.splats import GaussianSplats
from ..utils.config import RenderConfig
from .covariance import ALPHA_CUTOFF, QUAD_EXTENT
from .projection import ProjectedSplats, project_splats


def sanitize_projected(p: ProjectedSplats) -> ProjectedSplats:
    """Replace payload of invalid (behind-camera) splats with benign values so
    masked-out lanes can't contribute NaN/Inf to primals or gradients."""
    v = p.valid
    vcol = v[:, None]
    far_off = jnp.float32(-1e7)
    unit_x = jnp.array([1.0, 0.0], dtype=jnp.float32)
    unit_y = jnp.array([0.0, 1.0], dtype=jnp.float32)
    return ProjectedSplats(
        mean2d=jnp.where(vcol, p.mean2d, far_off),
        v1=jnp.where(vcol, p.v1, unit_x),
        v2=jnp.where(vcol, p.v2, unit_y),
        rgb=jnp.where(vcol, p.rgb, 0.0),
        opacity=jnp.where(v, p.opacity, 0.0),
        depth_sq=jnp.where(v, p.depth_sq, jnp.inf),
        valid=v,
    )


def splat_alpha_image(
    mean2d: jnp.ndarray,
    v1: jnp.ndarray,
    v2: jnp.ndarray,
    opacity: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    max_alpha: float,
    soft_cutoff: bool = False,
) -> jnp.ndarray:
    """Per-pixel alpha of one splat over a pixel grid.

    ``px, py``: pixel-center coordinate grids of any matching shape.
    With ``soft_cutoff=False`` applies the reference's quad-extent mask and
    1/255 discard; with True the pure (smooth) Gaussian falloff.
    """
    dx = px - mean2d[0]
    dy = py - mean2d[1]
    l1sq = v1[0] * v1[0] + v1[1] * v1[1]
    l2sq = v2[0] * v2[0] + v2[1] * v2[1]
    qx = (dx * v1[0] + dy * v1[1]) / l1sq
    qy = (dx * v2[0] + dy * v2[1]) / l2sq
    power = qx * qx + qy * qy
    alpha = jnp.clip(jnp.exp(-power) * opacity, 0.0, max_alpha)
    if soft_cutoff:
        return alpha
    inside = (jnp.abs(qx) <= QUAD_EXTENT) & (jnp.abs(qy) <= QUAD_EXTENT)
    keep = inside & (alpha >= ALPHA_CUTOFF)
    return jnp.where(keep, alpha, 0.0)


def composite_reference(
    projected: ProjectedSplats,
    width: int,
    height: int,
    config: RenderConfig = RenderConfig(),
) -> jnp.ndarray:
    """Depth-sort + front-to-back composite.  Returns (H, W, 4) premultiplied
    RGBA (alpha channel = 1 − final transmittance)."""
    p = sanitize_projected(projected)
    order = jnp.argsort(p.depth_sq)
    mean2d = p.mean2d[order]
    v1 = p.v1[order]
    v2 = p.v2[order]
    rgb = p.rgb[order]
    opacity = p.opacity[order]

    ys = (jnp.arange(height, dtype=jnp.float32) + 0.5)[:, None]
    xs = (jnp.arange(width, dtype=jnp.float32) + 0.5)[None, :]
    px = jnp.broadcast_to(xs, (height, width))
    py = jnp.broadcast_to(ys, (height, width))

    def step(carry, splat):
        color_acc, transmittance = carry
        s_mean, s_v1, s_v2, s_rgb, s_op = splat
        alpha = splat_alpha_image(
            s_mean, s_v1, s_v2, s_op, px, py, config.max_alpha, config.soft_cutoff
        )
        weight = alpha * transmittance
        color_acc = color_acc + weight[..., None] * s_rgb
        transmittance = transmittance * (1.0 - alpha)
        return (color_acc, transmittance), None

    init = (
        jnp.zeros((height, width, 3), dtype=jnp.float32),
        jnp.ones((height, width), dtype=jnp.float32),
    )
    (color, transmittance), _ = jax.lax.scan(step, init, (mean2d, v1, v2, rgb, opacity))
    return jnp.concatenate([color, (1.0 - transmittance)[..., None]], axis=-1)


def render_reference(
    splats: GaussianSplats,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
) -> jnp.ndarray:
    """End-to-end oracle render: project → sort → composite.  (H, W, 4)."""
    projected = project_splats(splats, camera, config.sh_order)
    return composite_reference(projected, camera.width, camera.height, config)
