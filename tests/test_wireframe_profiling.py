"""Wireframe debug mode + profiling harness tests."""

import jax
import numpy as np

from gsplat_tpu import RenderConfig, make_camera, make_splats
from gsplat_tpu.ops.wireframe import render_wireframe
from gsplat_tpu.utils.profiling import PhaseTimer, measure_fps, trace_span


class TestWireframe:
    def test_outline_not_filled(self):
        splats = make_splats(
            pos=[[0.0, 0.0, 0.0]],
            scale=[[0.3, 0.3, 0.3]],
            opacity=[1.0],
            color=[[1.0, 0.0, 0.0]],
        )
        cam = make_camera([0, 0, 3], [0, 0, 0], 64, 64)
        img = np.asarray(render_wireframe(splats, cam))
        # center (interior) empty, some edge pixels covered in the splat color
        assert img[32, 32, 3] == 0.0
        assert img[..., 3].sum() > 10
        covered = img[..., 3] > 0
        np.testing.assert_allclose(img[covered][:, 0], 1.0)  # red lines
        np.testing.assert_allclose(img[covered][:, 1], 0.0)

    def test_nearest_wins(self):
        splats = make_splats(
            pos=[[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]],
            scale=[[0.2] * 3, [0.3] * 3],  # both outlines inside the frame
            opacity=[1.0, 1.0],
            color=[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]],
        )
        cam = make_camera([0, 0, 3], [0, 0, 0], 64, 64)
        img = np.asarray(render_wireframe(splats, cam))
        overlap = (img[..., 3] > 0)
        # wherever both outlines cross, red (nearer) must win: so no pixel is
        # a blend, and red pixels exist
        assert ((img[overlap][:, 0] == 1.0) | (img[overlap][:, 1] == 1.0)).all()
        assert (img[..., 0] == 1.0).any()


class TestWireframePallas:
    def _scene(self, n=60, seed=3):
        rng = np.random.default_rng(seed)
        pos = rng.uniform(-0.8, 0.8, (n, 3)).astype(np.float32)
        q = rng.normal(size=(n, 4)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        scale = rng.uniform(0.02, 0.12, (n, 3)).astype(np.float32)
        opacity = rng.uniform(0.1, 1.0, n).astype(np.float32)
        color = rng.uniform(0.0, 1.0, (n, 3)).astype(np.float32)
        return make_splats(pos, q, scale, opacity, color)

    def test_matches_reference_backend(self):
        """The fused-kernel wireframe (band-test compositing) reproduces the
        O(N·H·W) oracle bit-for-bit: an opaque band hit saturates the pixel,
        so nearest-wins falls out of front-to-back order."""
        splats = self._scene()
        cam = make_camera([0, 0, 2.5], [0, 0, 0], 96, 64)
        ref = np.asarray(render_wireframe(splats, cam, backend="reference"))
        fast = np.asarray(
            render_wireframe(splats, cam, backend="pallas", interpret=True)
        )
        np.testing.assert_array_equal(ref, fast)

    def test_background_and_line_width(self):
        splats = self._scene(20)
        cam = make_camera([0, 0, 2.5], [0, 0, 0], 64, 64)
        bg = [0.2, 0.3, 0.4]
        ref = np.asarray(
            render_wireframe(splats, cam, line_px=2.0, background=bg,
                             backend="reference")
        )
        fast = np.asarray(
            render_wireframe(splats, cam, line_px=2.0, background=bg,
                             backend="pallas", interpret=True)
        )
        np.testing.assert_array_equal(ref, fast)


class TestProfiling:
    def test_phase_timer(self):
        t = PhaseTimer()
        with t.phase("sort"):
            sum(range(1000))
        with t.phase("sort"):
            sum(range(1000))
        s = t.summary()
        assert s["sort"]["count"] == 2
        assert s["sort"]["median_ms"] >= 0

    def test_trace_span_noop_without_profiler(self):
        with trace_span("projection"):
            pass

    def test_measure_fps(self):
        f = jax.jit(lambda x: x * 2)
        x = jax.numpy.ones((8, 8))
        r = measure_fps(f, x, iters=3, warmup=1)
        assert r["fps"] > 0


class TestWireOver:
    def test_wire_over_shaded_composites_under_lines(self):
        """Wire-over-shaded = reference's two-pass frame: lines opaque on
        top, beauty blended under with (1 − wire.a) — verified against
        manual composition of the two standalone renders, and both content
        types must be present."""
        import numpy as np

        import gsplat_tpu as gt

        splats = gt.random_splats(jax.random.PRNGKey(2), 64, extent=0.7)
        cam = gt.make_camera(eye=[0.1, 0.3, 2.6], target=[0, 0, 0], width=96, height=96)
        cfg = gt.RenderConfig(tile_capacity=512, transmittance_eps=0.0)
        out = np.asarray(
            gt.render_wire_over(splats, cam, cfg, backend="tiles")
        )
        wire = np.asarray(
            gt.render_wireframe(splats, cam, cfg, backend="reference")
        )
        beauty = np.asarray(gt.render(splats, cam, cfg, backend="tiles"))
        np.testing.assert_allclose(
            out, wire + beauty * (1.0 - wire[..., 3:4]), atol=1e-6
        )
        line = wire[..., 3] >= 1.0
        assert line.any()
        # line pixels show the line color, untouched by the beauty pass
        np.testing.assert_array_equal(out[line], wire[line])
        # non-line pixels are exactly the beauty pass
        np.testing.assert_array_equal(out[~line], beauty[~line])

    def test_wire_over_pallas_interpret_matches(self):
        import numpy as np

        import gsplat_tpu as gt

        splats = gt.random_splats(jax.random.PRNGKey(2), 48, extent=0.7)
        cam = gt.make_camera(eye=[0.1, 0.3, 2.6], target=[0, 0, 0], width=64, height=64)
        cfg = gt.RenderConfig(tile_capacity=512, transmittance_eps=0.0)
        a = np.asarray(
            gt.render_wire_over(splats, cam, cfg, backend="pallas_interpret")
        )
        b = np.asarray(gt.render_wire_over(splats, cam, cfg, backend="tiles"))
        np.testing.assert_allclose(a, b, atol=1e-5)
