"""Native host-runtime tests: C++ lib vs numpy fallback equivalence."""

import numpy as np
import pytest

from gsplat_tpu.io import native


def has_native():
    return native.get_lib() is not None


class TestNative:
    def test_lib_builds(self):
        # g++ is baked into the image; the lib must build
        assert has_native()

    def test_extract_columns(self):
        n, stride = 1000, 24
        rng = np.random.default_rng(0)
        rec = rng.normal(size=(n, 6)).astype(np.float32)
        raw = rec.tobytes()
        cols = native.extract_columns(raw, n, stride, [0, 8, 20])
        np.testing.assert_array_equal(cols[0], rec[:, 0])
        np.testing.assert_array_equal(cols[1], rec[:, 2])
        np.testing.assert_array_equal(cols[2], rec[:, 5])

    def test_activations(self):
        n = 257
        rng = np.random.default_rng(1)
        op = rng.normal(size=n).astype(np.float32)
        sc = [rng.normal(size=n).astype(np.float32) for _ in range(3)]
        rot = [rng.normal(size=n).astype(np.float32) for _ in range(4)]
        op_ref = 1.0 / (1.0 + np.exp(-op))
        sc_ref = [np.exp(s) for s in sc]
        w, x, y, z = rot
        inv = 1.0 / np.maximum(np.sqrt(w * w + x * x + y * y + z * z), 1e-12)
        o2, s2, (qx, qy, qz, qw) = native.activate_splats_inplace(
            op.copy(), [s.copy() for s in sc], [r.copy() for r in rot]
        )
        np.testing.assert_allclose(o2, op_ref, rtol=1e-6)
        for a, b in zip(s2, sc_ref):
            np.testing.assert_allclose(a, b, rtol=1e-6)
        np.testing.assert_allclose(qx, x * inv, rtol=1e-5)
        np.testing.assert_allclose(qw, w * inv, rtol=1e-5)

    def test_radix_argsort(self):
        rng = np.random.default_rng(2)
        keys = rng.normal(size=10000).astype(np.float32) * 100
        idx = native.radix_argsort(keys)
        np.testing.assert_array_equal(np.sort(keys), keys[idx])

    def test_radix_argsort_negatives_and_ties(self):
        keys = np.array([0.0, -1.5, 3.0, -1.5, 0.0, 2.0], np.float32)
        idx = native.radix_argsort(keys)
        np.testing.assert_array_equal(keys[idx], np.sort(keys))

    def test_morton_locality(self):
        # points along a line: Morton order must be monotone along the line
        n = 512
        t = np.linspace(0, 1, n).astype(np.float32)
        rng = np.random.default_rng(3)
        perm = rng.permutation(n)
        pos = np.stack([t[perm], t[perm], t[perm]])
        order = native.morton_order(pos)
        np.testing.assert_array_equal(t[perm][order], np.sort(t))
