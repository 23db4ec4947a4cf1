"""Config-surface features: only_sh debug mode + dropped-pair warning.

Reference behaviours covered:
  * ``onlySH`` shader debug flag (gsplat_plugin/shaders/GSplatShaderCoreLib.h:117-179)
    — base color replaced by 0.5 grey, SH bands still applied;
  * budget-cull warning (gsplat_plugin/src/GSplatRenderer.C:366-376) — pair
    overflow surfaces a once-per-condition warning instead of silent drop.
"""

import logging

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gsplat_tpu as gt
from gsplat_tpu.ops.projection import ROW_B, ROW_R, project_splats
from gsplat_tpu.ops.sh import shade_sh
from gsplat_tpu.utils.logging import get_logger


def _scene(n=64, seed=0):
    splats = gt.random_splats(jax.random.PRNGKey(seed), n, extent=0.6, sh_scale=0.2)
    cam = gt.make_camera(eye=[0.1, 0.2, 2.5], target=[0, 0, 0], width=64, height=64)
    return splats, cam


def test_only_sh_matches_shade_sh():
    """project_splats(only_sh=True) == shade_sh with a 0.5-grey base."""
    splats, cam = _scene()
    p = project_splats(splats, cam, sh_order=3, only_sh=True)
    got = p.fields[ROW_R : ROW_B + 1].T  # (N, 3)

    d = splats.pos - cam.position[:, None]
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    sh = splats.sh.T.reshape(-1, 15, 3)
    want = shade_sh(
        jnp.full((splats.count, 3), 0.5), sh, d.T, sh_order=3, only_sh=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_only_sh_changes_render():
    splats, cam = _scene()
    img = gt.render(splats, cam, gt.RenderConfig(), backend="tiles")
    img_dbg = gt.render(splats, cam, gt.RenderConfig(only_sh=True), backend="tiles")
    # alpha identical (geometry untouched), color differs
    np.testing.assert_allclose(
        np.asarray(img[..., 3]), np.asarray(img_dbg[..., 3]), atol=1e-6
    )
    assert not np.allclose(np.asarray(img[..., :3]), np.asarray(img_dbg[..., :3]))


def test_only_sh_order0_is_grey():
    splats, cam = _scene()
    p = project_splats(splats, cam, sh_order=0, only_sh=True)
    np.testing.assert_allclose(
        np.asarray(p.fields[ROW_R : ROW_B + 1]), 0.5, atol=1e-7
    )


def test_dropped_pairs_warns(caplog):
    """Overflowing the pair budget fires the cull warning (once), and the
    key re-arms when a later render has no overflow."""
    log = get_logger("binning")
    log.reset_once("dropped_pairs")
    splats, cam = _scene(n=256)
    # huge splats + tiny budget -> guaranteed overflow
    big = gt.GaussianSplats(
        pos=splats.pos,
        orient=splats.orient,
        scale=jnp.full_like(splats.scale, 0.5),
        opacity=jnp.ones_like(splats.opacity),
        color=splats.color,
        sh=splats.sh,
    )
    cfg = gt.RenderConfig(pairs_per_splat=0.1)
    with caplog.at_level(logging.WARNING, logger="gsplat_tpu.binning"):
        img = gt.render(big, cam, cfg, backend="tiles")
        jax.block_until_ready(img)
        jax.effects_barrier()
    assert any("dropped" in r.message for r in caplog.records)

    # once-per-condition: a second overflowing render does not re-log
    caplog.clear()
    with caplog.at_level(logging.WARNING, logger="gsplat_tpu.binning"):
        img = gt.render(big, cam, cfg, backend="tiles")
        jax.block_until_ready(img)
        jax.effects_barrier()
    assert not any("dropped" in r.message for r in caplog.records)

    # clearing the condition re-arms the key (small splats, ample budget)
    with caplog.at_level(logging.WARNING, logger="gsplat_tpu.binning"):
        img = gt.render(splats, cam, gt.RenderConfig(pairs_per_splat=8.0), backend="tiles")
        jax.block_until_ready(img)
        jax.effects_barrier()
        img = gt.render(big, cam, cfg, backend="tiles")
        jax.block_until_ready(img)
        jax.effects_barrier()
    assert any("dropped" in r.message for r in caplog.records)


def test_warn_on_drop_false_is_silent(caplog):
    log = get_logger("binning")
    log.reset_once("dropped_pairs")
    splats, cam = _scene(n=256)
    cfg = gt.RenderConfig(pairs_per_splat=0.1, warn_on_drop=False)
    with caplog.at_level(logging.WARNING, logger="gsplat_tpu.binning"):
        img = gt.render(splats, cam, cfg, backend="tiles")
        jax.block_until_ready(img)
        jax.effects_barrier()
    assert not any("dropped" in r.message for r in caplog.records)
