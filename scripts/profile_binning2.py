"""Micro-profile of bin_splats sub-stages on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import bin_splats, tile_grid
from gsplat_tpu.ops.projection import (
    ROW_CX, ROW_CY, ROW_HX, ROW_HY, ROW_OP, ROW_VALID,
    project_splats,
)
from gsplat_tpu.ops.covariance import ALPHA_CUTOFF
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W, H = 1920, 1080

key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.RenderConfig()


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
    print(f"{name:38s} {dt:9.2f} ms")
    return r


proj = jax.jit(lambda s: sort_by_depth(sanitize_projected(project_splats(s, cam, cfg.sh_order, tight_footprint=True))))(splats)
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)
num_tiles = nty * ntx
n = proj.count
budget = cfg.pair_budget(n)
print(f"n={n} budget={budget} tiles={num_tiles}")


def expand(p):
    f = p.fields
    x_lo = f[ROW_CX] - f[ROW_HX]
    x_hi = f[ROW_CX] + f[ROW_HX]
    y_lo = f[ROW_CY] - f[ROW_HY]
    y_hi = f[ROW_CY] + f[ROW_HY]
    cull = (
        (f[ROW_VALID] < 0.5)
        | (x_hi < 0.0)
        | (y_hi < 0.0)
        | (x_lo >= W)
        | (y_lo >= H)
        | (f[ROW_OP] < ALPHA_CUTOFF)
    )
    tw, th = float(cfg.tile_w), float(cfg.tile_h)
    tx0 = jnp.clip(jnp.floor(x_lo / tw).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / tw).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / th).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(y_hi / th).astype(jnp.int32), 0, nty - 1)
    nx = jnp.where(cull, 0, tx1 - tx0 + 1)
    ny = jnp.where(cull, 0, ty1 - ty0 + 1)
    counts = nx * ny
    cum = jnp.cumsum(counts)
    total = jnp.minimum(cum[-1], budget)
    offsets = cum - counts
    pair_idx = jnp.arange(budget, dtype=jnp.int32)
    splat_ids = jnp.arange(n, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].max(splat_ids + 1, mode="drop")
    s_safe = jnp.minimum(jax.lax.cummax(marks) - 1, n - 1)
    s_safe = jnp.maximum(s_safe, 0)
    exp_ops = jnp.stack([offsets, jnp.maximum(nx, 1), ty0 * ntx + tx0])
    g3 = exp_ops[:, s_safe]
    r = pair_idx - g3[0]
    nx_s = g3[1]
    dty = jnp.floor(r.astype(jnp.float32) / nx_s.astype(jnp.float32)).astype(jnp.int32)
    dtx = r - dty * nx_s
    tile = g3[2] + dty * ntx + dtx
    pair_valid = pair_idx < total
    tile = jnp.where(pair_valid, tile, num_tiles)
    splat_of_pair = jnp.where(pair_valid, s_safe, n)
    return tile, splat_of_pair, pair_idx


tile, splat_of_pair, pair_idx = timeit("expand (to tile ids)", expand, proj)

timeit("sort 2-op stable", lambda t, s: jax.lax.sort((t, s), num_keys=1, is_stable=True), tile, splat_of_pair)
timeit("sort 3-op stable", lambda t, s, e: jax.lax.sort((t, s, e), num_keys=1, is_stable=True), tile, splat_of_pair, pair_idx)
timeit("sort 1-op unstable packed", lambda t, s: jax.lax.sort((t.astype(jnp.uint32) << 21 | s.astype(jnp.uint32)),), tile, splat_of_pair)
timeit("sort 1key+1payload unstable", lambda t, s: jax.lax.sort((t.astype(jnp.uint32) << 21 | s.astype(jnp.uint32), s), num_keys=1), tile, splat_of_pair)


def post(tile_sorted, splat_sorted):
    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    raw_count = starts[1:] - starts[:-1]
    tile_count = jnp.minimum(raw_count, cfg.tile_capacity)
    chunk = cfg.chunk
    padded_count = -(-tile_count // chunk) * chunk
    aligned_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(padded_count).astype(jnp.int32)]
    )
    p_pad = -(-(budget + num_tiles * (chunk - 1) + chunk) // chunk) * chunk
    sb = starts[:-1]

    def seg_desc(values):
        m = jnp.zeros((budget,), jnp.int32).at[sb].max(values, mode="drop")
        return jax.lax.cummax(m)

    delta = seg_desc(aligned_start[:-1] - sb)
    cap_end = seg_desc(sb + tile_count)
    pi = jnp.arange(budget, dtype=jnp.int32)
    keep = pi < cap_end
    dest = jnp.where(keep, pi + delta, p_pad)
    pair_splat = jnp.full((p_pad,), n, dtype=jnp.int32).at[dest].set(splat_sorted, mode="drop")
    return pair_splat, aligned_start, tile_count


ts, ss = jax.jit(lambda t, s: jax.lax.sort((t, s), num_keys=1, is_stable=True))(tile, splat_of_pair)
timeit("post (seg desc + scatter)", post, ts, ss)
timeit("FULL bin_splats", lambda p: bin_splats(p, W, H, cfg, with_tiles=False), proj)
timeit("FULL bin_splats grad_map", lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True), proj)
