"""Per-splat projection: world splats → screen-space 2D Gaussians.

TPU-native replacement for the reference's main vertex shader
(``gsplat_plugin/shaders/GSplatShaderSource.h:190-288``): one vectorised
VPU-friendly pass over all splats instead of a per-(instance, vertex) GL
shader invocation.  Produces everything the compositing stage needs:

  * pixel-space center,
  * the two quad axes ``v1, v2`` (image coords, y-down) from the EWA 2D
    covariance eigen-decomposition,
  * view-dependent SH-shaded color,
  * opacity, squared camera distance (the reference's sort key,
    ``src/GSplatRenderer.C:176-216``), and a validity mask (behind-camera
    splats are killed exactly like the w≤0 branch at
    ``GSplatShaderSource.h:209-214``).

Fully differentiable; gradients flow to pos/orient/scale/opacity/color/sh.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.camera import Camera
from ..models.splats import GaussianSplats
from .covariance import decompose_covariance, ewa_project
from .quaternion import covariance_3d
from .sh import shade_sh


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ProjectedSplats:
    """Screen-space splats: the payload consumed by every rasterizer backend."""

    mean2d: jax.Array    # (N, 2) pixel coords of the center (x right, y down)
    v1: jax.Array        # (N, 2) major quad axis, pixels
    v2: jax.Array        # (N, 2) minor quad axis, pixels
    rgb: jax.Array       # (N, 3) SH-shaded color
    opacity: jax.Array   # (N,)
    depth_sq: jax.Array  # (N,) squared world distance to camera (sort key)
    valid: jax.Array     # (N,) bool — in front of camera

    @property
    def count(self) -> int:
        return self.mean2d.shape[0]


def project_splats(
    splats: GaussianSplats,
    camera: Camera,
    sh_order: int = 3,
) -> ProjectedSplats:
    """Project all splats for one camera.  ``sh_order`` must be static."""
    pos = splats.pos.astype(jnp.float32)
    view = camera.view.astype(jnp.float32)
    proj = camera.proj.astype(jnp.float32)

    # Center projection (net math of GSplatShaderSource.h:204-214 + viewport
    # transform; the shader's double y-flip cancels for the center).
    # Written as explicit broadcast arithmetic rather than matmuls so the
    # per-splat float ops are identical regardless of the array's shard shape
    # — this is what makes multi-device strip renders bit-match single-device
    # full-frame renders (XLA lowers small matmuls differently per shape).
    view_pos = (
        pos[..., 0:1] * view[:3, 0]
        + pos[..., 1:2] * view[:3, 1]
        + pos[..., 2:3] * view[:3, 2]
        + view[:3, 3]
    )
    clip = (
        view_pos[..., 0:1] * proj[:3, 0]
        + view_pos[..., 1:2] * proj[:3, 1]
        + view_pos[..., 2:3] * proj[:3, 2]
        + proj[:3, 3]
    )
    clip_w = (
        view_pos[..., 0] * proj[3, 0]
        + view_pos[..., 1] * proj[3, 1]
        + view_pos[..., 2] * proj[3, 2]
        + proj[3, 3]
    )
    valid = clip_w > 0.0
    safe_w = jnp.where(valid, clip_w, 1.0)
    ndc = clip / safe_w[..., None]
    px = (ndc[..., 0] + 1.0) * 0.5 * camera.width
    py = (1.0 - ndc[..., 1]) * 0.5 * camera.height
    mean2d = jnp.stack([px, py], axis=-1)

    # 3D covariance → EWA 2D covariance → pixel axes.
    cov3d = covariance_3d(splats.orient.astype(jnp.float32), splats.scale.astype(jnp.float32))
    cov2d = ewa_project(pos, cov3d, view, proj, float(camera.width))
    v1, v2 = decompose_covariance(cov2d)

    # SH color along the object-space view direction
    # (GSplatShaderSource.h:271-274; object transform is identity here —
    # the reference doesn't support OBJ-level transforms either,
    # src/GSplatRenderer.C:565-581).
    cam_pos = camera.position
    to_point = pos - cam_pos
    depth_sq = jnp.sum(to_point * to_point, axis=-1)
    rgb = splats.color.astype(jnp.float32)
    if sh_order > 0:
        norm = jnp.sqrt(jnp.maximum(depth_sq, 1e-24))
        direction = to_point / norm[..., None]
        rgb = shade_sh(rgb, splats.sh.astype(jnp.float32), direction, sh_order)

    opacity = splats.opacity.astype(jnp.float32)
    return ProjectedSplats(
        mean2d=mean2d,
        v1=v1,
        v2=v2,
        rgb=rgb,
        opacity=opacity,
        depth_sq=depth_sq,
        valid=valid,
    )
