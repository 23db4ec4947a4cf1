"""Geometric queries (ray/bbox picking) and JSON scene serialization.

Parity targets: ``GEO_PrimGsplat::intersectRay``
(``gsplat_plugin/src/GEO_GSplat.C:546-562`` — bbox slab test returning hit
distance/position) and ``geo_PrimGsplatJSON`` save/load (``:162-258``).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import gsplat_tpu as gt


@pytest.fixture(scope="module")
def splats():
    return gt.make_splats(
        pos=np.array([[-1.0, -1.0, -1.0], [1.0, 2.0, 3.0], [0.0, 0.5, 1.0]]),
        opacity=np.array([0.5, 0.8, 1.0]),
    )


class TestRayBBox:
    def test_hit_through_box(self, splats):
        # bbox is [-1,1]×[-1,2]×[-1,3]; ray from x=-5 along +x at y=z=0
        h = gt.intersect_ray_bbox(splats, [-5.0, 0.0, 0.0], [1.0, 0.0, 0.0])
        assert bool(h.hit)
        assert np.isclose(float(h.distance), 4.0)  # enters at x=-1
        np.testing.assert_allclose(np.asarray(h.pos), [-1.0, 0.0, 0.0], atol=1e-6)

    def test_miss(self, splats):
        h = gt.intersect_ray_bbox(splats, [-5.0, 10.0, 0.0], [1.0, 0.0, 0.0])
        assert not bool(h.hit)

    def test_origin_inside_box(self, splats):
        h = gt.intersect_ray_bbox(splats, [0.0, 0.0, 0.0], [0.0, 0.0, 1.0])
        assert bool(h.hit)
        assert float(h.distance) == 0.0  # clamped to origin, like tmin=0

    def test_tmax_cull(self, splats):
        h = gt.intersect_ray_bbox(splats, [-5.0, 0.0, 0.0], [1.0, 0.0, 0.0], tmax=2.0)
        assert not bool(h.hit)

    def test_behind_origin_misses(self, splats):
        h = gt.intersect_ray_bbox(splats, [-5.0, 0.0, 0.0], [-1.0, 0.0, 0.0])
        assert not bool(h.hit)

    def test_batched_matches_single(self, splats):
        orgs = np.array([[-5.0, 0.0, 0.0], [-5.0, 10.0, 0.0], [0.0, 0.0, 0.0]])
        dirs = np.array([[1.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
        hb = gt.intersect_rays_bbox(splats, orgs, dirs)
        for i in range(3):
            hs = gt.intersect_ray_bbox(splats, orgs[i], dirs[i])
            assert bool(hb.hit[i]) == bool(hs.hit)
            if bool(hs.hit):
                assert np.isclose(float(hb.distance[i]), float(hs.distance))

    def test_jittable(self, splats):
        f = jax.jit(lambda s, o, d: gt.intersect_ray_bbox(s, o, d))
        h = f(splats, jnp.array([-5.0, 0.0, 0.0]), jnp.array([1.0, 0.0, 0.0]))
        assert bool(h.hit)


class TestJsonIO:
    def test_roundtrip_bit_exact(self, tmp_path):
        s = gt.random_splats(jax.random.PRNGKey(3), 77, sh_scale=0.3)
        p = str(tmp_path / "scene.json")
        gt.save_json(p, s)
        s2 = gt.load_json(p)
        for f in ("pos", "orient", "scale", "opacity", "color", "sh"):
            np.testing.assert_array_equal(
                np.asarray(getattr(s, f)), np.asarray(getattr(s2, f))
            )

    def test_rejects_foreign_json(self, tmp_path):
        p = tmp_path / "x.json"
        p.write_text('{"format": "something_else"}')
        with pytest.raises(ValueError):
            gt.load_json(str(p))

    def test_renders_same_after_roundtrip(self, tmp_path):
        s = gt.random_splats(jax.random.PRNGKey(4), 64, extent=0.5)
        p = str(tmp_path / "scene.json")
        gt.save_json(p, s)
        s2 = gt.load_json(p)
        cam = gt.make_camera(eye=[0, 0, 2.5], target=[0, 0, 0], width=64, height=64)
        a = np.asarray(gt.render_tiles(s, cam))
        b = np.asarray(gt.render_tiles(s2, cam))
        np.testing.assert_array_equal(a, b)
