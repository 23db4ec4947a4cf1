"""EWA covariance projection and 2×2 eigen-decomposition.

TPU-native re-implementation of the reference GLSL core lib:

* ``CalcCovariance2D`` — EWA Splatting (Zwicker et al. 2002) eq. 31 with the
  reference's exact constants: ±1.3·tanFov view-space clamp, focal =
  screenW·P00/2, and a +0.3 px low-pass dilation on the 2D covariance
  diagonal (``gsplat_plugin/shaders/GSplatShaderCoreLib.h:38-76``).
* ``DecomposeCovariance`` — closed-form 2×2 eigen decomposition producing the
  pixel-space splat axes: λ₂ ≥ 0.1, axis length √(2λ) capped at 4096 px, with
  the built-in y-flip into image (y-down) coordinates
  (``GSplatShaderCoreLib.h:79-93``).

Everything is vectorised over a leading splat dimension and differentiable;
the clamps are non-differentiable kinks where JAX's subgradient semantics
apply (matching "stop-gradient at clamp").
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

# Reference constants (file:line cited above).
FOV_CLAMP = 1.3          # view-space frustum clamp multiplier
COV2D_DILATION = 0.3     # low-pass filter: min ~1px splat size
LAMBDA2_MIN = 0.1        # min minor eigenvalue
AXIS_MAX_PX = 4096.0     # max axis length in pixels
QUAD_EXTENT = 2.0        # quad spans ±2 units in the (v1, v2) eigen basis
ALPHA_CUTOFF = 1.0 / 255.0  # fragment discard threshold


def ewa_project(
    world_pos: jnp.ndarray,
    cov3d: jnp.ndarray,
    view: jnp.ndarray,
    proj: jnp.ndarray,
    screen_w: float,
) -> jnp.ndarray:
    """Project 3D covariances to 2D screen-space covariances (EWA eq. 31).

    Args:
      world_pos: ``(N, 3)`` splat centers in world space.
      cov3d: ``(N, 3, 3)`` symmetric 3D covariances.
      view: ``(4, 4)`` world→view matrix (OpenGL convention, camera looks
        down −z).
      proj: ``(4, 4)`` OpenGL perspective projection matrix.
      screen_w: screen width in pixels (the reference derives focal from the
        *width* only: ``focal = screenSize.x * matrixP[0][0] / 2``).

    Returns:
      ``(N, 3)`` packed 2D covariance ``(cov_xx, cov_xy, cov_yy)`` including
      the +0.3 dilation, in *view-aligned* screen coordinates (y-up; the
      y-flip into image space happens in :func:`decompose_covariance`).
    """
    p00 = proj[0, 0]
    p11 = proj[1, 1]
    # Faithful transcription of GSplatShaderCoreLib.h:44-49 — note that the
    # reference's tanFovY algebraically equals tanFovX (tanFovY =
    # 1/(P11·(P00/P11)) = 1/P00); we reproduce that behaviour exactly.
    aspect = p00 / p11
    tan_fov_x = 1.0 / p00
    tan_fov_y = 1.0 / (p11 * aspect)
    lim_x = FOV_CLAMP * tan_fov_x
    lim_y = FOV_CLAMP * tan_fov_y

    view_pos = world_pos @ view[:3, :3].T + view[:3, 3]
    # Visible points have vz < 0 (GL looks down −z).  Clamp vz away from 0 so
    # behind-camera splats (masked out downstream, like the reference's w≤0
    # transparent branch at GSplatShaderSource.h:209-214) produce finite
    # values instead of Inf/NaN that would poison gradients through `where`.
    vz = jnp.minimum(view_pos[..., 2], -1e-6)
    vx = jnp.clip(view_pos[..., 0] / vz, -lim_x, lim_x) * vz
    vy = jnp.clip(view_pos[..., 1] / vz, -lim_y, lim_y) * vz

    focal = screen_w * p00 / 2.0

    # Standard EWA Jacobian J (rows), evaluated at the clamped view position.
    inv_z = 1.0 / vz
    inv_z2 = inv_z * inv_z
    zeros = jnp.zeros_like(vz)
    j_row0 = jnp.stack([focal * inv_z, zeros, -focal * vx * inv_z2], axis=-1)
    j_row1 = jnp.stack([zeros, focal * inv_z, -focal * vy * inv_z2], axis=-1)
    j = jnp.stack([j_row0, j_row1], axis=-2)  # (N, 2, 3)

    # cov2d = J · (Rᵥ Σ Rᵥᵀ) · Jᵀ  where Rᵥ = view rotation.
    rv = view[:3, :3]
    cov_view = jnp.einsum("ab,nbc,dc->nad", rv, cov3d, rv)
    cov2d = jnp.einsum("nab,nbc,ndc->nad", j, cov_view, j)

    cxx = cov2d[..., 0, 0] + COV2D_DILATION
    cxy = cov2d[..., 0, 1]
    cyy = cov2d[..., 1, 1] + COV2D_DILATION
    return jnp.stack([cxx, cxy, cyy], axis=-1)


def decompose_covariance(cov2d: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """2×2 eigen decomposition → pixel-space axes (``GSplatShaderCoreLib.h:79-93``).

    Args:
      cov2d: ``(N, 3)`` packed ``(a, b, c)`` = (cov_xx, cov_xy, cov_yy).

    Returns:
      ``(v1, v2)``: each ``(N, 2)`` axis vectors in image space (x right,
      y **down** — the reference bakes the y-flip into the eigenvector), with
      lengths ``min(√(2λᵢ), 4096)`` and λ₂ clamped to ≥ 0.1.  The rendered
      quad spans ``±QUAD_EXTENT`` in this (v1, v2) basis.
    """
    a, b, c = cov2d[..., 0], cov2d[..., 1], cov2d[..., 2]
    mid = 0.5 * (a + c)
    # sqrt has an infinite derivative at 0 (exactly-isotropic covariance);
    # clamp the radicand so degenerate splats get a ~0 subgradient instead of
    # NaN (the eigen direction is genuinely undefined there).
    radius_sq = jnp.square((a - c) / 2.0) + jnp.square(b)
    radius = jnp.sqrt(jnp.maximum(radius_sq, 1e-18))
    lambda1 = mid + radius
    lambda2 = jnp.maximum(mid - radius, LAMBDA2_MIN)
    # normalize(vec2(b, λ1 − a)) with a grad-safe divide (GLSL normalize
    # yields garbage on the zero vector; we pick (1, 0) — the isotropic case
    # where any orthonormal basis is equivalent).
    ex = b
    ey = lambda1 - a
    norm_sq = ex * ex + ey * ey
    safe = norm_sq > 1e-24
    inv_norm = jnp.where(safe, jax.lax.rsqrt(jnp.where(safe, norm_sq, 1.0)), 0.0)
    dx = jnp.where(safe, ex * inv_norm, 1.0)
    dy = jnp.where(safe, ey * inv_norm, 0.0)
    dy = -dy  # image-space y-flip (GSplatShaderCoreLib.h:89)
    len1 = jnp.minimum(jnp.sqrt(2.0 * lambda1), AXIS_MAX_PX)
    len2 = jnp.minimum(jnp.sqrt(2.0 * lambda2), AXIS_MAX_PX)
    v1 = jnp.stack([len1 * dx, len1 * dy], axis=-1)
    v2 = jnp.stack([len2 * dy, -len2 * dx], axis=-1)
    return v1, v2
