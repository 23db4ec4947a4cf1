"""Pallas kernel equivalence tests (interpreter mode on CPU).

Validates the fused forward/backward kernels against the pure-XLA tiled
backend — same binning, same math, so tolerances are float-rounding level.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import RenderConfig, make_camera, random_splats, render_tiles
from gsplat_tpu.render import render_pallas

CFG = RenderConfig(tile_capacity=512, transmittance_eps=0.0)


def scene(n=150, seed=0, w=64, h=64, sh=0.2):
    splats = random_splats(jax.random.PRNGKey(seed), n, extent=0.8, sh_scale=sh)
    cam = make_camera(eye=[0.2, 0.4, 3.0], target=[0, 0, 0], width=w, height=h)
    return splats, cam


class TestForward:
    @pytest.mark.parametrize("seed,n", [(0, 150), (1, 400)])
    def test_matches_tiled(self, seed, n):
        splats, cam = scene(n=n, seed=seed)
        a = np.asarray(render_tiles(splats, cam, CFG))
        b = np.asarray(render_pallas(splats, cam, CFG, interpret=True))
        np.testing.assert_allclose(b, a, atol=1e-6)

    def test_odd_image_size(self):
        splats, cam = scene(n=100, w=70, h=45)
        a = np.asarray(render_tiles(splats, cam, CFG))
        b = np.asarray(render_pallas(splats, cam, CFG, interpret=True))
        np.testing.assert_allclose(b, a, atol=1e-6)

    def test_empty_scene_tiles(self):
        # camera looking away: every tile empty
        splats, _ = scene(n=20)
        cam = make_camera([0, 0, -5], [0, 0, -10], 64, 64)
        img = np.asarray(render_pallas(splats, cam, CFG, interpret=True))
        assert np.abs(img).max() == 0.0

    def test_early_termination_close_to_exact(self):
        # opaque scene: early stop (eps=1e-4) must match exact to ~eps
        splats, cam = scene(n=400, sh=0.0)
        splats = dataclasses.replace(splats, opacity=jnp.full((400,), 0.95))
        exact = np.asarray(render_pallas(splats, cam, CFG, interpret=True))
        fast_cfg = dataclasses.replace(CFG, transmittance_eps=1e-4)
        fast = np.asarray(render_pallas(splats, cam, fast_cfg, interpret=True))
        assert np.abs(fast - exact).max() < 1e-3


class TestBackward:
    def test_grads_match_tiled_autodiff(self):
        splats, cam = scene(n=150)
        w = jax.random.normal(jax.random.PRNGKey(5), (64, 64, 4))
        g1 = jax.grad(lambda s: jnp.sum(render_tiles(s, cam, CFG) * w))(splats)
        g2 = jax.grad(lambda s: jnp.sum(render_pallas(s, cam, CFG, interpret=True) * w))(splats)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            a = np.asarray(getattr(g1, f))
            b = np.asarray(getattr(g2, f))
            tol = 2e-4 * max(1.0, np.abs(a).max())
            np.testing.assert_allclose(b, a, atol=tol, err_msg=f)

    def test_grads_with_early_termination_finite(self):
        # early stop truncates gradient tails but must stay finite and close
        splats, cam = scene(n=300)
        splats = dataclasses.replace(splats, opacity=jnp.full((300,), 0.9))
        cfg = dataclasses.replace(CFG, transmittance_eps=1e-3)
        g = jax.grad(
            lambda s: jnp.mean(render_pallas(s, cam, cfg, interpret=True)[..., :3])
        )(splats)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            assert np.isfinite(np.asarray(getattr(g, f))).all(), f

    def test_soft_cutoff_mode(self):
        splats, cam = scene(n=100)
        cfg = dataclasses.replace(CFG, soft_cutoff=True)
        a = np.asarray(render_tiles(splats, cam, cfg))
        b = np.asarray(render_pallas(splats, cam, cfg, interpret=True))
        np.testing.assert_allclose(b, a, atol=1e-6)
        w = jax.random.normal(jax.random.PRNGKey(6), (64, 64, 4))
        g1 = jax.grad(lambda s: jnp.sum(render_tiles(s, cam, cfg) * w))(splats)
        g2 = jax.grad(lambda s: jnp.sum(render_pallas(s, cam, cfg, interpret=True) * w))(splats)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            a_ = np.asarray(getattr(g1, f))
            b_ = np.asarray(getattr(g2, f))
            tol = 2e-4 * max(1.0, np.abs(a_).max())
            np.testing.assert_allclose(b_, a_, atol=tol, err_msg=f)
