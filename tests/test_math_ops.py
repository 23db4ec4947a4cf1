"""Unit tests for the core math stages (SURVEY.md §4 test pyramid level 1):
quat→M, Σ, EWA cov2d, eigen axes, SH eval — against independently computed
values (numpy, textbook formulas), not against the framework itself."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gsplat_tpu.ops.quaternion import covariance_3d, rotation_scale_matrix
from gsplat_tpu.ops.covariance import (
    decompose_covariance,
    ewa_project,
    AXIS_MAX_PX,
    LAMBDA2_MIN,
)
from gsplat_tpu.ops.sh import shade_sh, SH_C1
from gsplat_tpu.models.camera import look_at, perspective


def std_rotmat(w, x, y, z):
    """Textbook rotation matrix for unit quaternion (w,x,y,z)."""
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


class TestQuaternion:
    def test_identity_quat(self):
        m = rotation_scale_matrix(jnp.array([[0.0, 0, 0, 1.0]]), jnp.array([[2.0, 3.0, 4.0]]))
        np.testing.assert_allclose(m[0], np.diag([2.0, 3.0, 4.0]), atol=1e-6)

    def test_covariance_matches_textbook(self):
        # Σ = Rᵀ_ref S² R_ref must equal the standard R S² Rᵀ with the
        # textbook R, because the reference's matrix is the transpose.
        rng = np.random.default_rng(0)
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        w, x, y, z = q
        s = np.array([0.5, 1.5, 2.5])
        r = std_rotmat(w, x, y, z)
        expected = r @ np.diag(s**2) @ r.T
        got = covariance_3d(jnp.array([[x, y, z, w]]), jnp.array([s]))[0]
        np.testing.assert_allclose(got, expected, atol=1e-5)

    def test_covariance_symmetric_psd(self):
        key = jax.random.PRNGKey(1)
        q = jax.random.normal(key, (64, 4))
        q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
        s = jax.random.uniform(key, (64, 3), minval=0.1, maxval=2.0)
        cov = covariance_3d(q, s)
        np.testing.assert_allclose(cov, jnp.swapaxes(cov, -1, -2), atol=1e-5)
        eig = np.linalg.eigvalsh(np.asarray(cov))
        assert (eig > 0).all()


class TestEWA:
    def _camera(self, w=640, h=480):
        view = jnp.asarray(look_at([0.0, 0.0, 3.0], [0.0, 0.0, 0.0]))
        proj = jnp.asarray(perspective(60.0, w, h))
        return view, proj, w, h

    def test_isotropic_splat_cov2d(self):
        # An isotropic Gaussian of std s at distance d on the optical axis
        # projects to cov2d ≈ (focal·s/d)² · I + 0.3·I.
        view, proj, w, h = self._camera()
        s = 0.1
        cov3d = jnp.eye(3)[None] * s**2
        pos = jnp.array([[0.0, 0.0, 0.0]])  # 3 units from the camera
        cov2d = ewa_project(pos, cov3d, view, proj, float(w))
        focal = w * proj[0, 0] / 2.0
        expected = (focal * s / 3.0) ** 2
        np.testing.assert_allclose(cov2d[0, 0], expected + 0.3, rtol=1e-4)
        np.testing.assert_allclose(cov2d[0, 2], expected + 0.3, rtol=1e-4)
        np.testing.assert_allclose(cov2d[0, 1], 0.0, atol=1e-4)

    def test_dilation_floor(self):
        # A vanishingly small splat still gets the +0.3 px low-pass term.
        view, proj, w, h = self._camera()
        cov3d = jnp.eye(3)[None] * 1e-12
        cov2d = ewa_project(jnp.array([[0.0, 0.0, 0.0]]), cov3d, view, proj, float(w))
        np.testing.assert_allclose(cov2d[0, 0], 0.3, atol=1e-5)
        np.testing.assert_allclose(cov2d[0, 2], 0.3, atol=1e-5)


class TestDecompose:
    def test_axes_orthogonal_and_lengths(self):
        cov = jnp.array([[4.0, 1.0, 2.0]])
        v1, v2 = decompose_covariance(cov)
        v1, v2 = np.asarray(v1[0]), np.asarray(v2[0])
        assert abs(v1 @ v2) < 1e-5
        a, b, c = 4.0, 1.0, 2.0
        mid, rad = (a + c) / 2, np.hypot((a - c) / 2, b)
        np.testing.assert_allclose(np.linalg.norm(v1), np.sqrt(2 * (mid + rad)), rtol=1e-5)
        np.testing.assert_allclose(np.linalg.norm(v2), np.sqrt(2 * max(mid - rad, 0.1)), rtol=1e-5)

    def test_lambda2_clamp(self):
        # Degenerate covariance: minor eigenvalue clamps to 0.1.
        v1, v2 = decompose_covariance(jnp.array([[4.0, 0.0, 0.0]]))
        np.testing.assert_allclose(np.linalg.norm(np.asarray(v2[0])), np.sqrt(2 * LAMBDA2_MIN), rtol=1e-5)

    def test_axis_cap(self):
        v1, _ = decompose_covariance(jnp.array([[1e9, 0.0, 1.0]]))
        assert np.linalg.norm(np.asarray(v1[0])) <= AXIS_MAX_PX + 1e-3

    def test_eigvec_matches_numpy_with_yflip(self):
        cov = np.array([3.0, -1.2, 1.5])
        m = np.array([[cov[0], cov[1]], [cov[1], cov[2]]])
        lam, vec = np.linalg.eigh(m)
        e1 = vec[:, 1]  # major
        v1, _ = decompose_covariance(jnp.array([cov]))
        got = np.asarray(v1[0])
        got_dir = got / np.linalg.norm(got)
        # reference flips y into image space
        e1_flipped = np.array([e1[0], -e1[1]])
        assert min(np.linalg.norm(got_dir - e1_flipped), np.linalg.norm(got_dir + e1_flipped)) < 1e-5


class TestSH:
    def test_order0_passthrough(self):
        base = jnp.array([[0.2, 0.4, 0.6]])
        sh = jnp.zeros((1, 15, 3))
        out = shade_sh(base, sh, jnp.array([[0.0, 0.0, 1.0]]), 0)
        np.testing.assert_allclose(out, base)

    def test_band1_single_coeff(self):
        # res = base + SH_C1·(−sh1·y + sh2·z − sh3·x); probe sh2 with dir=+z.
        base = jnp.array([[0.5, 0.5, 0.5]])
        sh = jnp.zeros((1, 15, 3)).at[0, 1, 0].set(1.0)  # sh2, red channel
        out = shade_sh(base, sh, jnp.array([[0.0, 0.0, 1.0]]), 1)
        np.testing.assert_allclose(out[0, 0], 0.5 + SH_C1, rtol=1e-6)
        np.testing.assert_allclose(out[0, 1:], 0.5, rtol=1e-6)

    def test_clamped_nonnegative(self):
        base = jnp.array([[0.0, 0.0, 0.0]])
        sh = -jnp.ones((1, 15, 3))
        out = shade_sh(base, sh, jnp.array([[0.57735, 0.57735, 0.57735]]), 3)
        assert (np.asarray(out) >= 0).all()

    def test_orders_nest(self):
        # order-k result equals order-3 with bands >k zeroed.
        key = jax.random.PRNGKey(3)
        base = jax.random.uniform(key, (8, 3))
        sh = jax.random.normal(key, (8, 15, 3)) * 0.2
        d = jax.random.normal(key, (8, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        for order, nkeep in [(1, 3), (2, 8)]:
            sh_trunc = sh.at[:, nkeep:, :].set(0.0)
            np.testing.assert_allclose(
                shade_sh(base, sh, d, order), shade_sh(base, sh_trunc, d, 3), atol=1e-6
            )

    def test_grad_flows(self):
        def loss(sh):
            return jnp.sum(shade_sh(jnp.ones((1, 3)) * 0.5, sh, jnp.array([[0.6, 0.0, 0.8]]), 3))

        g = jax.grad(loss)(jnp.ones((1, 15, 3)) * 0.1)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0

    def test_invalid_order_raises(self):
        with pytest.raises(ValueError):
            shade_sh(jnp.zeros((1, 3)), jnp.zeros((1, 15, 3)), jnp.zeros((1, 3)), 4)
