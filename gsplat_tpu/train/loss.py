"""Image losses for splat fitting: L1 + DSSIM (the standard 3DGS objective).

The reference has no training/optimization at all (SURVEY.md: "no
training/optimization, no autodiff"); this implements the capability the
north star requires: fitting splats from posed images.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


def l1_loss(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.abs(pred - target))


@functools.lru_cache(maxsize=4)
def _gaussian_window(size: int, sigma: float):
    # numpy on purpose: an lru_cache of jnp values built inside a jit trace
    # would cache a tracer and poison every later trace (UnexpectedTracerError
    # on the second jit that calls ssim).  A host constant embeds cleanly.
    x = np.arange(size, dtype=np.float32) - (size - 1) / 2.0
    g = np.exp(-(x**2) / (2.0 * sigma**2))
    return g / np.sum(g)


def _filter2d_separable(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Depthwise separable 2-D convolution, SAME padding.  img: (H, W, C)."""
    c = img.shape[-1]
    k = window.shape[0]
    x = img.transpose(2, 0, 1)[:, None]  # (C, 1, H, W)
    kernel_h = jnp.tile(window.reshape(1, 1, k, 1), (c, 1, 1, 1))
    kernel_w = jnp.tile(window.reshape(1, 1, 1, k), (c, 1, 1, 1))
    dn = jax.lax.conv_dimension_numbers(x.shape, kernel_h.shape, ("NCHW", "OIHW", "NCHW"))
    pad_h = [((k - 1) // 2, k // 2), (0, 0)]
    pad_w = [(0, 0), ((k - 1) // 2, k // 2)]
    # batch=channels trick: feature_group_count=C for depthwise
    y = jax.lax.conv_general_dilated(
        x.transpose(1, 0, 2, 3), kernel_h, (1, 1), pad_h, dimension_numbers=dn,
        feature_group_count=c,
    )
    y = jax.lax.conv_general_dilated(
        y, kernel_w, (1, 1), pad_w, dimension_numbers=dn, feature_group_count=c
    )
    return y[0].transpose(1, 2, 0)


def ssim(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Mean SSIM over an (H, W, C) image pair in [0, 1]."""
    w = _gaussian_window(window_size, sigma)
    mu_p = _filter2d_separable(pred, w)
    mu_t = _filter2d_separable(target, w)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    var_p = _filter2d_separable(pred * pred, w) - mu_pp
    var_t = _filter2d_separable(target * target, w) - mu_tt
    cov = _filter2d_separable(pred * target, w) - mu_pt
    num = (2.0 * mu_pt + c1) * (2.0 * cov + c2)
    den = (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    return jnp.mean(num / den)


def render_loss(
    pred_rgb: jnp.ndarray,
    target_rgb: jnp.ndarray,
    lambda_dssim: float = 0.2,
    use_ssim: bool = True,
) -> jnp.ndarray:
    """The 3DGS objective: (1−λ)·L1 + λ·(1−SSIM)."""
    loss = (1.0 - lambda_dssim) * l1_loss(pred_rgb, target_rgb)
    if use_ssim and lambda_dssim > 0.0:
        loss = loss + lambda_dssim * (1.0 - ssim(pred_rgb, target_rgb))
    return loss


def _halo_exchange(x: jnp.ndarray, axis_name: str, n_strips: int, halo: int) -> jnp.ndarray:
    """Extend a row strip with ``halo`` rows from each neighbour over the
    mesh axis.  Devices with no neighbour receive ppermute's zero fill —
    exactly the SAME zero padding the full-image convolution applies at the
    global top/bottom edges."""
    up = jax.lax.ppermute(
        x[-halo:], axis_name, [(i, i + 1) for i in range(n_strips - 1)]
    )
    dn = jax.lax.ppermute(
        x[:halo], axis_name, [(i + 1, i) for i in range(n_strips - 1)]
    )
    return jnp.concatenate([up, x, dn], axis=0)


def ssim_strip(
    pred: jnp.ndarray,
    target: jnp.ndarray,
    axis_name: str,
    n_strips: int,
    window_size: int = 11,
    sigma: float = 1.5,
    c1: float = 0.01**2,
    c2: float = 0.03**2,
) -> jnp.ndarray:
    """Per-strip mean SSIM under row-strip sharding (SPMD).

    Each device holds a horizontal strip of the image; the 11×11 SSIM
    windows near strip boundaries need up to 5 neighbour rows, exchanged
    with ``jax.lax.ppermute`` (the halo pattern).  The cropped per-strip
    SSIM map rows equal the full-image map rows, so the mean of the per-
    strip means over equal strips IS the full-image mean SSIM (to float
    rounding).  With ``n_strips == 1`` this reduces to :func:`ssim`.
    """
    if n_strips == 1:
        return ssim(pred, target, window_size, sigma, c1, c2)
    halo = window_size // 2
    p = _halo_exchange(pred, axis_name, n_strips, halo)
    t = _halo_exchange(target, axis_name, n_strips, halo)
    w = _gaussian_window(window_size, sigma)
    mu_p = _filter2d_separable(p, w)
    mu_t = _filter2d_separable(t, w)
    mu_pp = mu_p * mu_p
    mu_tt = mu_t * mu_t
    mu_pt = mu_p * mu_t
    var_p = _filter2d_separable(p * p, w) - mu_pp
    var_t = _filter2d_separable(t * t, w) - mu_tt
    cov = _filter2d_separable(p * t, w) - mu_pt
    num = (2.0 * mu_pt + c1) * (2.0 * cov + c2)
    den = (mu_pp + mu_tt + c1) * (var_p + var_t + c2)
    return jnp.mean((num / den)[halo:-halo])


def psnr(pred: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    mse = jnp.mean(jnp.square(pred - target))
    return -10.0 * jnp.log10(jnp.maximum(mse, 1e-12))
