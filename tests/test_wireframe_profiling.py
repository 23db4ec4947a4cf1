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
