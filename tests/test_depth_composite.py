"""Depth-tested compositing into a host scene — the reference's beauty-pass
contract: splats drawn after all opaque geometry, z-TESTED against the
scene's depth buffer but not z-written, under-blended over the scene color
(``gsplat_plugin/src/GSplatRenderer.C:595-610``)."""

import jax
import jax.numpy as jnp
import numpy as np

import gsplat_tpu as gt
from gsplat_tpu.render import composite_over

CFG = gt.RenderConfig(tile_capacity=512, transmittance_eps=0.0)
W, H = 160, 96


def scene():
    splats = gt.random_splats(jax.random.PRNGKey(0), 600, extent=0.9, sh_scale=0.2)
    cam = gt.make_camera(eye=[0, 0.5, 3], target=[0, 0, 0], width=W, height=H)
    return splats, cam


def occluder():
    """Slanted synthetic depth plane cutting through the splat cloud
    (view depth 2.0 → 3.5 across the image) + an opaque scene color."""
    xs = jnp.linspace(0, 1, W)[None, :]
    bgd = (2.0 + 1.5 * xs) * jnp.ones((H, 1))
    bg_rgba = jnp.concatenate(
        [jnp.full((H, W, 3), 0.3), jnp.ones((H, W, 1))], axis=-1
    )
    return bgd, bg_rgba


class TestDepthComposite:
    def test_backends_agree(self):
        splats, cam = scene()
        bgd, bg_rgba = occluder()
        imgs = {
            be: np.asarray(
                gt.render(splats, cam, CFG, backend=be,
                          background_rgba=bg_rgba, background_depth=bgd)
            )
            for be in ("reference", "tiles", "pallas_interpret")
        }
        np.testing.assert_allclose(imgs["tiles"], imgs["reference"], atol=1e-5)
        np.testing.assert_allclose(
            imgs["pallas_interpret"], imgs["tiles"], atol=1e-5
        )

    def test_occluder_is_load_bearing(self):
        splats, cam = scene()
        bgd, bg_rgba = occluder()
        with_z = np.asarray(
            gt.render(splats, cam, CFG, backend="tiles",
                      background_rgba=bg_rgba, background_depth=bgd)
        )
        without = np.asarray(
            gt.render(splats, cam, CFG, backend="tiles",
                      background_rgba=bg_rgba)
        )
        assert np.abs(with_z - without).max() > 1e-3
        # far-infinite depth == no test at all
        far = np.asarray(
            gt.render(splats, cam, CFG, backend="tiles",
                      background_rgba=bg_rgba,
                      background_depth=jnp.full((H, W), jnp.inf))
        )
        np.testing.assert_array_equal(far, without)

    def test_fully_occluded_shows_scene_only(self):
        splats, cam = scene()
        _, bg_rgba = occluder()
        img = np.asarray(
            gt.render(splats, cam, CFG, backend="tiles",
                      background_rgba=bg_rgba,
                      background_depth=jnp.zeros((H, W)))
        )
        np.testing.assert_array_equal(img, np.asarray(bg_rgba))

    def test_grads_through_depth_test(self):
        splats, cam = scene()
        bgd, _ = occluder()

        def loss(s, be):
            return jnp.sum(
                gt.render(s, cam, CFG, backend=be, background_depth=bgd)[..., :3]
            )

        gp = jax.grad(lambda s: loss(s, "pallas_interpret"))(splats)
        gtl = jax.grad(lambda s: loss(s, "tiles"))(splats)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            a = np.asarray(getattr(gtl, f))
            b = np.asarray(getattr(gp, f))
            assert np.isfinite(b).all()
            np.testing.assert_allclose(
                b, a, atol=2e-4 * max(1.0, np.abs(a).max()), err_msg=f
            )

    def test_composite_over_math(self):
        layer = jnp.zeros((4, 4, 4)).at[..., 3].set(0.25).at[..., 0].set(0.1)
        bg = jnp.ones((4, 4, 4))
        out = np.asarray(composite_over(layer, bg))
        np.testing.assert_allclose(out[..., 0], 0.1 + 0.75)
        np.testing.assert_allclose(out[..., 3], 0.25 + 0.75)

    def test_depth_test_rejects_packed(self):
        import pytest

        with pytest.raises(ValueError):
            gt.RenderConfig(payload_dtype="packed", depth_test=True)
