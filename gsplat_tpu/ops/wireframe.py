"""Wireframe debug rendering: splat quad outlines.

TPU analogue of the reference's wireframe path — 8 verts per splat forming a
line quad at the ±2 footprint extent in the (v1, v2) eigen basis, drawn flat
in the splat's base color (``gsplat_plugin/src/GR_GSplat.C:376-421``,
``shaders/GSplatShaderSource.h:22-110``).  Here: a per-pixel band test on the
quad-basis coordinates — pixels within ~``line_px`` of the quad edge take the
splat's color; nearest splat wins (opaque lines, like GL depth-tested lines).

Debug tooling: clarity over speed (same O(N·H·W) structure as the oracle).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.camera import Camera
from ..models.splats import GaussianSplats
from ..ops.covariance import QUAD_EXTENT
from ..ops.projection import project_splats
from ..ops.rasterize_ref import sanitize_projected
from ..ops.rasterize_tiles import sort_by_depth
from ..utils.config import RenderConfig


def render_wireframe(
    splats: GaussianSplats,
    camera: Camera,
    config: RenderConfig = RenderConfig(),
    line_px: float = 1.0,
    background=None,
) -> jnp.ndarray:
    """Render quad outlines.  Returns (H, W, 4); alpha 1 where a line covers."""
    p = sort_by_depth(sanitize_projected(project_splats(splats, camera, 0)))
    rows = p.fields.T  # (N, 16)

    h, w = camera.height, camera.width
    ys = (jnp.arange(h, dtype=jnp.float32) + 0.5)[:, None]
    xs = (jnp.arange(w, dtype=jnp.float32) + 0.5)[None, :]
    px = jnp.broadcast_to(xs, (h, w))
    py = jnp.broadcast_to(ys, (h, w))

    def step(carry, row):
        color_acc, covered = carry
        # quad-basis coords from A = v1/|v1|², B = v2/|v2|²: q = d·A, d·B
        dx = px - row[0]
        dy = py - row[1]
        qx = dx * row[2] + dy * row[3]
        qy = dx * row[4] + dy * row[5]
        # |A| = 1/|v1| → band half-width in quad units for ~line_px on screen
        wq1 = line_px * jnp.sqrt(row[2] ** 2 + row[3] ** 2)
        wq2 = line_px * jnp.sqrt(row[4] ** 2 + row[5] ** 2)
        m = jnp.maximum(jnp.abs(qx), jnp.abs(qy))
        wq = jnp.where(jnp.abs(qx) > jnp.abs(qy), wq1, wq2)
        on_edge = (jnp.abs(m - QUAD_EXTENT) <= wq) & (m <= QUAD_EXTENT + wq)
        hit = on_edge & ~covered
        color_acc = jnp.where(hit[..., None], row[6:9], color_acc)
        return (color_acc, covered | on_edge), None

    init = (jnp.zeros((h, w, 3), dtype=jnp.float32), jnp.zeros((h, w), dtype=bool))
    (color, covered), _ = jax.lax.scan(step, init, rows)
    alpha = covered.astype(jnp.float32)
    if background is not None:
        bg = jnp.asarray(background, jnp.float32)
        color = jnp.where(covered[..., None], color, bg)
    return jnp.concatenate([color, alpha[..., None]], axis=-1)
