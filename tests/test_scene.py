"""SceneRegistry tests: registry lifecycle, version flushing, budget cull,
multi-cluster global sort correctness, amortized re-sort, origin re-basing."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from gsplat_tpu import RenderConfig, make_camera, make_splats, random_splats, render_tiles
from gsplat_tpu.scene import SceneRegistry

CFG = RenderConfig(tile_capacity=512, transmittance_eps=0.0)


def frame(reg, *ids):
    for rid in ids:
        reg.include_in_render_pass(rid)


class TestRegistry:
    def test_multi_cluster_matches_concat(self):
        k = jax.random.PRNGKey(0)
        a = random_splats(jax.random.fold_in(k, 0), 60, extent=0.5)
        b = random_splats(jax.random.fold_in(k, 1), 40, extent=0.5)
        cam = make_camera([0.1, 0.3, 2.5], [0, 0, 0], 64, 64)

        reg = SceneRegistry(CFG)
        ra = reg.register_update("sopA", a)
        rb = reg.register_update("sopB", b)
        frame(reg, ra, rb)
        img = np.asarray(reg.render(cam, backend="tiles"))
        reg.post_render()

        # single global sort across both clusters == rendering the concat
        ref = np.asarray(render_tiles(a.concat(b), cam, CFG))
        np.testing.assert_allclose(img, ref, atol=1e-5)

    def test_version_flush(self):
        a1 = random_splats(jax.random.PRNGKey(0), 20)
        a2 = random_splats(jax.random.PRNGKey(1), 30)
        reg = SceneRegistry(CFG)
        r1 = reg.register_update("sopA", a1, version=1)
        r2 = reg.register_update("sopA", a2, version=2)
        assert r1 not in reg._entries  # stale version flushed
        assert r2 in reg._entries

    def test_inactive_clusters_not_drawn(self):
        a = random_splats(jax.random.PRNGKey(0), 30, extent=0.5)
        cam = make_camera([0, 0.3, 2.5], [0, 0, 0], 48, 48)
        reg = SceneRegistry(CFG)
        ra = reg.register_update("sopA", a)
        reg.register_update("sopB", random_splats(jax.random.PRNGKey(1), 30, extent=0.5))
        frame(reg, ra)  # only A active
        img = np.asarray(reg.render(cam, backend="tiles"))
        ref = np.asarray(render_tiles(a, cam, CFG))
        np.testing.assert_allclose(img, ref, atol=1e-5)

    def test_empty_render_returns_none(self):
        reg = SceneRegistry(CFG)
        cam = make_camera([0, 0, 2], [0, 0, 0], 32, 32)
        assert reg.render(cam) is None

    def test_aging_eviction(self):
        reg = SceneRegistry(CFG, max_age=1)
        rid = reg.register_update("sopA", random_splats(jax.random.PRNGKey(0), 8))
        cam = make_camera([0, 0, 2], [0, 0, 0], 32, 32)
        frame(reg, rid)
        reg.render(cam, backend="tiles")
        reg.post_render()  # age 0 → active reset
        reg.post_render()  # age 1
        reg.post_render()  # age 2 > max_age → evicted
        assert rid not in reg._entries

    def test_budget_cull(self):
        # Partial-cluster clamp: the cluster crossing the cap still
        # contributes its first budget − total splats — total drawn is
        # exactly min(total, GSplatCountMax), the reference's
        # myGSplatCount = std::min(...) (src/GSplatRenderer.C:364-366).
        cfg = dataclasses.replace(CFG, max_splats=50)
        reg = SceneRegistry(cfg)
        b_splats = random_splats(jax.random.PRNGKey(1), 40, extent=0.5)
        ra = reg.register_update("sopA", random_splats(jax.random.PRNGKey(0), 40, extent=0.5))
        rb = reg.register_update("sopB", b_splats)
        frame(reg, ra, rb)
        reg.generate_render_geometry()
        assert reg._cached.count == 50  # 40 + first 10 of the crossing cluster
        # the clamped tail really is cluster B's head (origin-rebased)
        origin = np.asarray(reg._origin)
        np.testing.assert_allclose(
            np.asarray(reg._cached.pos[:, 40:]) + origin[:, None],
            np.asarray(b_splats.pos[:, :10]),
            atol=1e-6,
        )
        # a fully over-budget third cluster is still dropped entirely
        rc = reg.register_update("sopC", random_splats(jax.random.PRNGKey(2), 8))
        frame(reg, ra, rb, rc)
        reg.generate_render_geometry()
        assert reg._cached.count == 50

    def test_geometry_cache_reused(self):
        reg = SceneRegistry(CFG)
        rid = reg.register_update("sopA", random_splats(jax.random.PRNGKey(0), 16))
        frame(reg, rid)
        assert reg.generate_render_geometry() is True
        frame(reg, rid)
        assert reg.generate_render_geometry() is False  # cached

    def test_amortized_sort_threshold(self):
        reg = SceneRegistry(CFG)
        reg.sort_movement_threshold = 1e9  # effectively never re-sort
        rid = reg.register_update("sopA", random_splats(jax.random.PRNGKey(0), 16, extent=0.4))
        cam1 = make_camera([0, 0, 2.5], [0, 0, 0], 32, 32)
        cam2 = make_camera([0.5, 0, 2.5], [0, 0, 0], 32, 32)
        frame(reg, rid)
        reg.render(cam1, backend="tiles")
        order1 = np.asarray(reg._order)
        reg.post_render()
        frame(reg, rid)
        reg.render(cam2, backend="tiles")
        order2 = np.asarray(reg._order)
        np.testing.assert_array_equal(order1, order2)  # stale order kept

        # threshold 0 (reference default): any movement re-sorts
        reg2 = SceneRegistry(CFG)
        rid2 = reg2.register_update("sopA", random_splats(jax.random.PRNGKey(0), 16, extent=0.4))
        frame(reg2, rid2)
        reg2.render(cam1, backend="tiles")
        frame(reg2, rid2)
        reg2.render(cam2, backend="tiles")
        assert reg2._accum_delta_sq == 0.0  # re-sorted (accumulator reset)

    def test_explicit_camera_pos_consumed_once(self):
        reg = SceneRegistry(CFG)
        rid = reg.register_update("sopA", random_splats(jax.random.PRNGKey(0), 16, extent=0.4))
        cam = make_camera([0, 0, 2.5], [0, 0, 0], 32, 32)
        reg.set_explicit_camera_pos([5.0, 0.0, 0.0])
        frame(reg, rid)
        reg.render(cam, backend="tiles")
        reg.post_render()
        assert reg._explicit_camera_pos is None  # cleared each frame

    def test_origin_rebase_matches_direct(self):
        # clusters far from the world origin: origin re-basing must not
        # change the image (same math, translated camera)
        far = jnp.array([100.0, -50.0, 80.0])
        base = random_splats(jax.random.PRNGKey(0), 40, extent=0.5)
        shifted = dataclasses.replace(base, pos=base.pos + far[:, None])
        eye = np.asarray([0.1, 0.3, 2.5]) + np.asarray(far)
        tgt = np.asarray(far)
        cam = make_camera(eye, tgt, 48, 48)
        reg = SceneRegistry(CFG)
        rid = reg.register_update("sopA", shifted)
        frame(reg, rid)
        img = np.asarray(reg.render(cam, backend="tiles"))
        ref = np.asarray(render_tiles(shifted, cam, CFG))
        np.testing.assert_allclose(img, ref, atol=2e-3)
        assert img[..., 3].max() > 0.1  # actually rendered something

    def test_sh_order_setter_clamps(self):
        reg = SceneRegistry(CFG)
        reg.set_sh_order(7)
        assert reg._sh_order == 0
        reg.set_sh_order(2)
        assert reg._sh_order == 2
