"""Per-stage timing of the pallas render pipeline on the real chip.

Times: projection / sanitize+sort / binning / payload gather / composite
fwd / full fwd / full fwd+bwd — each as an isolated jitted function.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import bin_splats, tile_grid
from gsplat_tpu.ops.pallas.composite import _pad_rows, composite_pairs_pallas, unpack_image
from gsplat_tpu.ops.projection import ProjectedSplats, project_splats
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W, H = 1920, 1080

key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.tune_pair_budget(splats, cam, gt.RenderConfig(), headroom=1.02)
print("tuned budget:", cfg.pair_budget_override)


def probe(r):
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(r):
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    float(acc)


def timeit(name, fn, *args, iters=5):
    f = jax.jit(fn)
    r = f(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:30s} {dt:9.2f} ms")
    return f(*args)


proj = timeit("project", lambda s: project_splats(s, cam, cfg.sh_order, tight_footprint=True), splats)
san = timeit("sanitize+sort", lambda p: sort_by_depth(sanitize_projected(p)), proj)
binned = timeit(
    "bin", lambda p: bin_splats(p, W, H, cfg, with_tiles=False), san
)


def gather(p, b):
    return _pad_rows(p.fields[:10][:, b.pair_splat])


payload = timeit("payload gather", gather, san, binned)
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)


def comp(pay, b):
    packed = composite_pairs_pallas(
        pay, b.tile_base, b.tile_phi, b.tile_span, jnp.zeros((2,), jnp.int32),
        nty, ntx, cfg, False
    )
    return unpack_image(packed, H, W)


img = timeit("composite fwd", comp, payload, binned)


def full_fwd(s):
    return gt.render(s, cam, cfg, backend="pallas")


timeit("FULL fwd", full_fwd, splats)


from gsplat_tpu.ops.pallas.composite import composite_splats_pallas

binned_g = jax.jit(
    lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True)
)(san)


def csp(f_, b):
    packed = composite_splats_pallas(
        f_, b.pair_splat, b.tile_base, b.tile_phi, b.tile_span, b.grad_base,
        b.dest_of_exp, b.exp_offsets, b.exp_counts, b.exp_rank,
        jnp.zeros((2,), jnp.int32), None, None, nty, ntx, cfg, False
    )
    return unpack_image(packed, H, W)


def csp_bwd(p, b):
    def loss(f_):
        return jnp.sum(csp(f_, b)[..., :3])

    return jax.grad(loss)(p.fields[:10])


timeit("bin (grad map)", lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True), san)
timeit("gather+composite+segsum fwd+bwd", csp_bwd, san, binned_g)


def sort_bwd(p):
    def loss(f_):
        return jnp.sum(sort_by_depth(sanitize_projected(ProjectedSplats(fields=f_))).fields)

    return jax.grad(loss)(p.fields)


timeit("sanitize+sort fwd+bwd", sort_bwd, proj)


def proj_bwd(s):
    def loss(s_):
        return jnp.sum(project_splats(s_, cam, cfg.sh_order).fields[:10])

    return jax.grad(loss)(s)


timeit("project fwd+bwd", proj_bwd, splats)


def full_fb(s):
    def loss(s_):
        return jnp.sum(full_fwd(s_)[..., :3])

    return jax.grad(loss)(s)


timeit("FULL fwd+bwd", full_fb, splats)

# pair statistics
b = jax.jit(lambda p: bin_splats(p, W, H, cfg, with_tiles=False))(san)
tc = jax.device_get(b.tile_count)
print(f"pairs: total={int(tc.sum())} max/tile={int(tc.max())} budget={b.pair_budget} dropped={int(jax.device_get(b.dropped_pairs))}")
