"""Oracle rasterizer tests (BASELINE.json config 1): forward-image sanity
properties + finite-difference gradient checks against JAX autodiff."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu import (
    RenderConfig,
    make_camera,
    make_splats,
    random_splats,
    render_reference,
)
from gsplat_tpu.ops.projection import project_splats
from gsplat_tpu.ops.rasterize_ref import composite_reference


def single_splat_scene(opacity=0.8, scale=0.15, color=(1.0, 0.2, 0.1)):
    splats = make_splats(
        pos=[[0.0, 0.0, 0.0]],
        scale=[[scale, scale, scale]],
        opacity=[opacity],
        color=[list(color)],
    )
    cam = make_camera(eye=[0.0, 0.0, 3.0], target=[0.0, 0.0, 0.0], width=64, height=64)
    return splats, cam


class TestForward:
    def test_single_splat_center_alpha(self):
        # A centered isotropic splat: center pixel α ≈ opacity (power≈0).
        splats, cam = single_splat_scene(opacity=0.8)
        img = render_reference(splats, cam)
        assert img.shape == (64, 64, 4)
        # pixel (32,32) center sits (0.5,0.5) px off the projected splat
        # center, so α = 0.8·exp(−|d|²/(2λ)) ≈ 0.787 here, slightly < 0.8.
        center = np.asarray(img[32, 32])
        assert abs(center[3] - 0.8) < 0.02
        # premultiplied: rgb = color·α
        np.testing.assert_allclose(center[:3], np.array([1.0, 0.2, 0.1]) * center[3], rtol=0.02)

    def test_empty_background(self):
        splats, cam = single_splat_scene()
        img = np.asarray(render_reference(splats, cam))
        assert img[0, 0, 3] < 1e-6  # corner untouched
        assert (img >= 0).all() and (img[..., 3] <= 1.0 + 1e-6).all()

    def test_radial_falloff_symmetry(self):
        splats, cam = single_splat_scene()
        img = np.asarray(render_reference(splats, cam))[..., 3]
        # isotropic splat, symmetric camera → 4-fold symmetry around center
        # (pixel centers are offset half a pixel, so compare mirrored halves)
        np.testing.assert_allclose(img[32:, :], img[31::-1, :], atol=1e-4)
        np.testing.assert_allclose(img[:, 32:], img[:, 31::-1], atol=1e-4)

    def test_front_to_back_order(self):
        # red splat in front of green splat, both opaque-ish: red dominates.
        splats = make_splats(
            pos=[[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]],  # camera at z=3 → first is closer
            scale=[[0.2] * 3] * 2,
            opacity=[0.9, 0.9],
            color=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        )
        cam = make_camera(eye=[0.0, 0.0, 3.0], target=[0.0, 0.0, 0.0], width=32, height=32)
        img = np.asarray(render_reference(splats, cam))
        c = img[16, 16]
        assert c[0] > 5 * c[1]  # red >> green

    def test_behind_camera_culled(self):
        splats = make_splats(
            pos=[[0.0, 0.0, 10.0]],  # behind the camera at z=3 looking at origin
            scale=[[0.5] * 3],
            opacity=[1.0],
            color=[[1.0, 1.0, 1.0]],
        )
        cam = make_camera(eye=[0.0, 0.0, 3.0], target=[0.0, 0.0, 0.0], width=32, height=32)
        img = np.asarray(render_reference(splats, cam))
        assert np.abs(img).max() == 0.0

    def test_alpha_cutoff_discard(self):
        # opacity below 1/255 → nothing rendered at all.
        splats, cam = single_splat_scene(opacity=0.003)
        img = np.asarray(render_reference(splats, cam))
        assert np.abs(img).max() == 0.0

    def test_sh_changes_with_view_direction(self):
        key = jax.random.PRNGKey(0)
        splats = random_splats(key, 16, extent=0.5, sh_scale=0.3)
        cam1 = make_camera([0, 0, 3], [0, 0, 0], 32, 32)
        cam2 = make_camera([3, 0, 0], [0, 0, 0], 32, 32)
        img_sh = render_reference(splats, cam1, RenderConfig(sh_order=3))
        img_nosh = render_reference(splats, cam1, RenderConfig(sh_order=0))
        assert np.abs(np.asarray(img_sh) - np.asarray(img_nosh)).max() > 1e-3
        # and a different view gives different SH shading
        img2 = render_reference(splats, cam2, RenderConfig(sh_order=3))
        assert np.abs(np.asarray(img_sh) - np.asarray(img2)).max() > 1e-3


class TestGradients:
    """Finite-difference checks of d(loss)/d(param) for every splat field."""

    def setup_method(self):
        key = jax.random.PRNGKey(42)
        # small, smooth scene away from clamp kinks
        self.splats = random_splats(key, 8, extent=0.4, scale_range=(0.05, 0.12), sh_scale=0.1)
        # keep opacity mid-range so α is far from the 1/255 cutoff and the
        # max_alpha clamp (non-differentiable kinks)
        self.splats = self.splats.__class__(
            **{
                **{f: getattr(self.splats, f) for f in ("pos", "orient", "scale", "color", "sh")},
                "opacity": jnp.full((8,), 0.6),
            }
        )
        self.cam = make_camera([0.1, 0.2, 3.0], [0, 0, 0], 24, 24)
        # soft_cutoff: the hard 1/255 discard and ±2 quad truncation are jump
        # discontinuities (jump size independent of FD eps), so FD is checked
        # on the smooth path; the masked path shares all code minus a
        # `where`, and its subgradients are exercised by test_invalid_sanitized
        # and the tiled-backend gradient tests.
        self.cfg = RenderConfig(sh_order=2, soft_cutoff=True)
        # fixed random pixel-weight so the scalar loss probes the whole image
        self.w = jax.random.normal(jax.random.PRNGKey(7), (24, 24, 4))

    def loss(self, splats):
        img = render_reference(splats, self.cam, self.cfg)
        return jnp.sum(img * self.w)

    @pytest.mark.parametrize("field", ["pos", "orient", "scale", "opacity", "color", "sh"])
    def test_fd_grad(self, field):
        loss_fn = jax.jit(self.loss)
        grads = jax.grad(self.loss)(self.splats)
        g = np.asarray(getattr(grads, field), dtype=np.float64)
        assert np.isfinite(g).all()

        rng = np.random.default_rng(0)
        base = np.asarray(getattr(self.splats, field), dtype=np.float64)
        # Probe random coordinates with central differences.  The reference
        # semantics are *discontinuous* (hard 1/255 discard and the ±2 quad
        # truncation at α≈exp(−4)·opacity — GSplatShaderSource.h:309,
        # :185-187), so an FD step that moves a footprint boundary across a
        # pixel center disagrees with the (correct) subgradient.  Use a small
        # eps and allow one outlier probe per field.
        flat_idx = rng.choice(base.size, size=min(6, base.size), replace=False)
        eps = 5e-4
        failures = []
        for idx in flat_idx:
            delta = np.zeros(base.size)
            delta[idx] = eps
            delta = delta.reshape(base.shape)

            def replaced(sign):
                val = jnp.asarray(base + sign * delta, dtype=jnp.float32)
                return self.splats.__class__(
                    **{
                        f: (val if f == field else getattr(self.splats, f))
                        for f in ("pos", "orient", "scale", "opacity", "color", "sh")
                    }
                )

            f_plus = float(loss_fn(replaced(+1)))
            f_minus = float(loss_fn(replaced(-1)))
            fd = (f_plus - f_minus) / (2 * eps)
            ad = float(g.reshape(-1)[idx])
            # tolerance: fp32 render noise + O(eps²) FD error
            if abs(fd - ad) > 5e-2 * max(1.0, abs(fd), abs(ad)):
                failures.append(f"{field}[{idx}]: fd={fd:.6f} ad={ad:.6f}")
        assert len(failures) <= 1, failures


class TestProjectedCulling:
    def test_invalid_sanitized(self):
        # splats behind camera must not produce NaNs anywhere
        splats = make_splats(
            pos=[[0.0, 0.0, 5.0], [0.0, 0.0, 0.0]],
            scale=[[0.1] * 3] * 2,
            opacity=[0.9, 0.9],
            color=[[1, 0, 0], [0, 1, 0]],
        )
        cam = make_camera([0, 0, 3], [0, 0, 0], 16, 16)
        p = project_splats(splats, cam, 0)
        assert bool(p.valid[1]) and not bool(p.valid[0])
        img = composite_reference(p, 16, 16)
        assert np.isfinite(np.asarray(img)).all()

        # gradient also finite
        def loss(s):
            return jnp.sum(render_reference(s, cam))

        g = jax.grad(loss)(splats)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            assert np.isfinite(np.asarray(getattr(g, f))).all(), f
