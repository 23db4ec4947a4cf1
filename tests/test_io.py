"""IO tests: PLY round-trip with activations, attribute-convention ingest
(all 3 SH conventions, opacity|Alpha precedence, missing-attr defaults)."""

import numpy as np
import jax
import pytest

from gsplat_tpu.io.attributes import detail_config, resolve_sh, splats_from_attributes
from gsplat_tpu.io.ply import load_ply, read_ply_raw, save_ply
from gsplat_tpu.models.splats import random_splats
from gsplat_tpu.ops.sh import SH_C0


class TestPly:
    def test_round_trip(self, tmp_path):
        splats = random_splats(jax.random.PRNGKey(0), 50, sh_scale=0.3)
        # keep opacity strictly inside (0,1) for exact logit round-trip
        import dataclasses, jax.numpy as jnp
        splats = dataclasses.replace(splats, opacity=jnp.clip(splats.opacity, 0.01, 0.99))
        path = tmp_path / "test.ply"
        save_ply(path, splats)
        loaded = load_ply(path)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            np.testing.assert_allclose(
                np.asarray(getattr(loaded, f)),
                np.asarray(getattr(splats, f)),
                rtol=1e-4,
                atol=1e-5,
                err_msg=f,
            )

    def test_quat_reorder_and_activations(self, tmp_path):
        # hand-written tiny PLY: one splat, known raw values
        n = 1
        fields = (
            [("x", "<f4"), ("y", "<f4"), ("z", "<f4")]
            + [(f"f_dc_{i}", "<f4") for i in range(3)]
            + [("opacity", "<f4")]
            + [(f"scale_{i}", "<f4") for i in range(3)]
            + [(f"rot_{i}", "<f4") for i in range(4)]
        )
        rec = np.zeros(n, dtype=np.dtype(fields))
        rec["x"], rec["y"], rec["z"] = 1.0, 2.0, 3.0
        rec["f_dc_0"] = 1.0
        rec["opacity"] = 0.0  # sigmoid(0) = 0.5
        rec["scale_0"] = rec["scale_1"] = rec["scale_2"] = 0.0  # exp(0) = 1
        rec["rot_0"], rec["rot_1"], rec["rot_2"], rec["rot_3"] = 2.0, 0.0, 0.0, 0.0  # w=2
        header = ["ply", "format binary_little_endian 1.0", "element vertex 1"]
        header += [f"property float {name}" for name, _ in fields]
        header += ["end_header", ""]
        path = tmp_path / "tiny.ply"
        with open(path, "wb") as f:
            f.write("\n".join(header).encode())
            f.write(rec.tobytes())

        s = load_ply(path)
        np.testing.assert_allclose(np.asarray(s.pos_n3)[0], [1, 2, 3])
        np.testing.assert_allclose(np.asarray(s.opacity)[0], 0.5)
        np.testing.assert_allclose(np.asarray(s.scale_n3)[0], [1, 1, 1])
        # (w=2,x,y,z=0) normalized → orient xyzw = (0,0,0,1)
        np.testing.assert_allclose(np.asarray(s.orient_n4)[0], [0, 0, 0, 1])
        np.testing.assert_allclose(np.asarray(s.color_n3)[0], [SH_C0 + 0.5, 0.5, 0.5], rtol=1e-6)

    def test_raw_reader_rejects_garbage(self, tmp_path):
        p = tmp_path / "bad.ply"
        p.write_bytes(b"not a ply\n")
        with pytest.raises(ValueError):
            read_ply_raw(p)


class TestAttributes:
    def _base(self, n=4):
        rng = np.random.default_rng(0)
        return {
            "P": rng.normal(size=(n, 3)).astype(np.float32),
            "Cd": rng.uniform(size=(n, 3)).astype(np.float32),
            "orient": np.tile([0, 0, 0, 1.0], (n, 1)).astype(np.float32),
            "scale": rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32),
        }

    def test_opacity_precedence(self):
        a = self._base()
        a["Alpha"] = np.full(4, 0.25, np.float32)
        s = splats_from_attributes(a)
        np.testing.assert_allclose(np.asarray(s.opacity), 0.25)
        a["opacity"] = np.full(4, 0.75, np.float32)  # takes precedence
        s = splats_from_attributes(a)
        np.testing.assert_allclose(np.asarray(s.opacity), 0.75)

    def test_missing_attrs_defaults(self):
        s = splats_from_attributes({"P": np.zeros((3, 3), np.float32)})
        np.testing.assert_allclose(np.asarray(s.color), 0.0)
        np.testing.assert_allclose(np.asarray(s.opacity), 1.0)
        np.testing.assert_allclose(np.asarray(s.scale), 1.0)
        np.testing.assert_allclose(np.asarray(s.orient_n4), np.tile([0, 0, 0, 1.0], (3, 1)))

    def test_sh_three_conventions_agree(self):
        n = 5
        rng = np.random.default_rng(1)
        sh_full = rng.normal(size=(n, 15, 3)).astype(np.float32)
        # 1: array attribute
        a1 = resolve_sh({"sh_coefficients": sh_full}, n)
        # 2: sh1..sh15 vec3 attrs
        a2 = resolve_sh({f"sh{j+1}": sh_full[:, j, :] for j in range(15)}, n)
        # 3: planar f_rest
        rest = {}
        for j in range(15):
            rest[f"f_rest_{j}"] = sh_full[:, j, 0]
            rest[f"f_rest_{j+15}"] = sh_full[:, j, 1]
            rest[f"f_rest_{j+30}"] = sh_full[:, j, 2]
        a3 = resolve_sh(rest, n)
        np.testing.assert_allclose(a1, sh_full)
        np.testing.assert_allclose(a2, sh_full)
        np.testing.assert_allclose(a3, sh_full)

    def test_sh_truncated_array(self):
        # sh_coefficients with only 3 coeffs (degree 1) zero-fills the rest
        n = 2
        arr = np.ones((n, 3, 3), np.float32)
        sh = resolve_sh({"sh_coefficients": arr}, n)
        assert sh.shape == (n, 15, 3)
        np.testing.assert_allclose(sh[:, :3], 1.0)
        np.testing.assert_allclose(sh[:, 3:], 0.0)

    def test_sh_none(self):
        assert resolve_sh({}, 3) is None

    def test_missing_P_raises(self):
        with pytest.raises(ValueError):
            splats_from_attributes({"Cd": np.zeros((3, 3))})

    def test_detail_config(self):
        cam, order = detail_config(
            {"gsplat__explicit_camera_pos": [1.0, 2.0, 3.0], "gsplat__sh_order": 2}
        )
        np.testing.assert_allclose(cam, [1, 2, 3])
        assert order == 2
        # out-of-range clamps to 0 with an error, like the reference
        _, order = detail_config({"gsplat__sh_order": 7})
        assert order == 0
        cam, order = detail_config({})
        assert cam is None and order == 3
