"""Golden-image regression fixtures (absolute output pinning).

All other image tests are *relative* (pallas ↔ tiles ↔ oracle), so a
coordinated regression — e.g. a constants change drifting all three backends
together — would pass every test.  These fixtures pin the absolute f32
output of fixed scenes; regenerate ONLY for an intentional semantics change:

    python tests/test_goldens.py --regen
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")


def _scenes():
    import jax

    import gsplat_tpu as gt

    exact = gt.RenderConfig(tile_capacity=512, transmittance_eps=0.0)
    scenes = {
        "basic_400": (
            gt.random_splats(jax.random.PRNGKey(0), 400, extent=0.8, sh_scale=0.2),
            gt.make_camera(eye=[0.2, 0.4, 3.0], target=[0, 0, 0], width=96, height=64),
            exact,
        ),
        "soft_sh1": (
            gt.random_splats(jax.random.PRNGKey(3), 250, extent=0.7, sh_scale=0.3),
            gt.make_camera(eye=[-0.4, 0.2, 2.5], target=[0, 0.1, 0], width=64, height=96),
            gt.RenderConfig(
                tile_capacity=512, transmittance_eps=0.0, soft_cutoff=True, sh_order=1
            ),
        ),
    }
    return scenes


def _render_all(splats, cam, cfg):
    import gsplat_tpu as gt
    from gsplat_tpu.render import render_pallas

    return {
        "reference": np.asarray(gt.render_reference(splats, cam, cfg)),
        "tiles": np.asarray(gt.render_tiles(splats, cam, cfg)),
        "pallas": np.asarray(render_pallas(splats, cam, cfg, interpret=True)),
    }


def test_goldens_pin_all_backends():
    # Two golden families: the O(N·H·W) oracle composites the *infinite*
    # Gaussian tails in soft_cutoff mode, while the binned backends truncate
    # at the footprint bbox — an intended semantic difference, so the oracle
    # and the binned pair pin separately.  (With the hard cutoff the families
    # agree to float rounding, which the `basic_400` scene checks.)
    scenes = _scenes()
    for name, (splats, cam, cfg) in scenes.items():
        imgs = _render_all(splats, cam, cfg)
        for family, backends in (("oracle", ["reference"]), ("binned", ["tiles", "pallas"])):
            path = os.path.join(GOLDEN_DIR, f"{name}.{family}.npz")
            assert os.path.exists(path), f"golden missing: {path} (run --regen)"
            golden = np.load(path)["image"]
            for backend in backends:
                diff = np.abs(imgs[backend] - golden).max()
                assert diff < 1e-5, f"{name}/{backend} drifted from golden: {diff}"
        if not cfg.soft_cutoff:
            a = np.load(os.path.join(GOLDEN_DIR, f"{name}.oracle.npz"))["image"]
            b = np.load(os.path.join(GOLDEN_DIR, f"{name}.binned.npz"))["image"]
            assert np.abs(a - b).max() < 1e-5, f"{name}: families diverged"


if __name__ == "__main__" and "--regen" in sys.argv:
    import jax

    jax.config.update("jax_platforms", "cpu")
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    for name, (splats, cam, cfg) in _scenes().items():
        import gsplat_tpu as gt

        oracle = np.asarray(gt.render_reference(splats, cam, cfg))
        binned = np.asarray(gt.render_tiles(splats, cam, cfg))
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.oracle.npz"), image=oracle)
        np.savez_compressed(os.path.join(GOLDEN_DIR, f"{name}.binned.npz"), image=binned)
        print("wrote", name, oracle.shape,
              "oracle-vs-binned maxdiff:", float(np.abs(oracle - binned).max()))
