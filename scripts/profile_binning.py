"""Micro-profile bin_splats internals at 1M splats / 1080p."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import tile_grid
from gsplat_tpu.ops.covariance import ALPHA_CUTOFF
from gsplat_tpu.ops.projection import (
    ROW_CX, ROW_CY, ROW_HX, ROW_HY, ROW_OP, ROW_VALID, project_splats,
)
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = 1_000_000
W, H = 1920, 1080
key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.RenderConfig()

p = jax.jit(lambda s: sort_by_depth(sanitize_projected(project_splats(s, cam, cfg.sh_order))))(splats)
f = p.fields
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)
num_tiles = nty * ntx
budget = cfg.pair_budget(N)
print("budget", budget, "tiles", num_tiles)


def probe(r):
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(r):
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    float(acc)


def timeit(name, fn, *args, iters=5):
    jf = jax.jit(fn)
    r = jf(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = jf(*args)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:34s} {dt:9.2f} ms")
    return jf(*args)


def stage_counts(f):
    x_lo = f[ROW_CX] - f[ROW_HX]
    x_hi = f[ROW_CX] + f[ROW_HX]
    y_lo = f[ROW_CY] - f[ROW_HY]
    y_hi = f[ROW_CY] + f[ROW_HY]
    cull = (
        (f[ROW_VALID] < 0.5) | (x_hi < 0.0) | (y_hi < 0.0)
        | (x_lo >= W) | (y_lo >= H) | (f[ROW_OP] < ALPHA_CUTOFF)
    )
    tw, th = float(cfg.tile_w), float(cfg.tile_h)
    tx0 = jnp.clip(jnp.floor(x_lo / tw).astype(jnp.int32), 0, ntx - 1)
    tx1 = jnp.clip(jnp.floor(x_hi / tw).astype(jnp.int32), 0, ntx - 1)
    ty0 = jnp.clip(jnp.floor(y_lo / th).astype(jnp.int32), 0, nty - 1)
    ty1 = jnp.clip(jnp.floor(y_hi / th).astype(jnp.int32), 0, nty - 1)
    nx = jnp.where(cull, 0, tx1 - tx0 + 1)
    ny = jnp.where(cull, 0, ty1 - ty0 + 1)
    return tx0, ty0, nx, nx * ny


tx0, ty0, nx, counts = timeit("bbox+counts", stage_counts, f)

cum = jnp.cumsum(counts)
offsets = cum - counts


def stage_pairmap(offsets, counts, nx, tx0, ty0):
    total = offsets[-1] + counts[-1]
    pair_idx = jnp.arange(budget, dtype=jnp.int32)
    splat_ids = jnp.arange(N, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].max(splat_ids + 1, mode="drop")
    s_safe = jnp.minimum(jax.lax.cummax(marks) - 1, N - 1)
    s_safe = jnp.maximum(s_safe, 0)
    r = pair_idx - offsets[s_safe]
    nx_s = jnp.maximum(nx[s_safe], 1)
    dty = jnp.floor(r.astype(jnp.float32) / nx_s.astype(jnp.float32)).astype(jnp.int32)
    dtx = r - dty * nx_s
    tile = (ty0[s_safe] + dty) * ntx + (tx0[s_safe] + dtx)
    pair_valid = pair_idx < jnp.minimum(total, budget)
    tile = jnp.where(pair_valid, tile, num_tiles)
    splat_of_pair = jnp.where(pair_valid, s_safe, N)
    return tile, splat_of_pair


tile, splat_of_pair = timeit("pair expansion (scatter+cummax)", stage_pairmap, offsets, counts, nx, tx0, ty0)

# isolate the scatter-max alone
timeit(
    "  scatter-max",
    lambda o: jnp.zeros((budget,), jnp.int32).at[o].max(
        jnp.arange(N, dtype=jnp.int32) + 1, mode="drop"
    ),
    offsets,
)
timeit("  cummax", lambda m: jax.lax.cummax(m), jnp.zeros((budget,), jnp.int32))
timeit(
    "  4 gathers",
    lambda s: (offsets[s], nx[s], tx0[s], ty0[s]),
    jnp.clip(jnp.arange(budget, dtype=jnp.int32) % N, 0, N - 1),
)

sorted_pair = timeit(
    "stable sort by tile (2-arr)",
    lambda t, s: jax.lax.sort((t, s), num_keys=1, is_stable=True),
    tile,
    splat_of_pair,
)
tile_sorted, splat_sorted = sorted_pair

# packed single-key alternative: key = tile * 2^23 + rank  (budget < 2^23? no, 4.2M < 2^23=8.4M ok)
def packed_sort(t, s):
    key = t.astype(jnp.int64) * jnp.int64(budget) + jnp.arange(budget, dtype=jnp.int64)
    ks = jax.lax.sort(key)
    return (ks // budget).astype(jnp.int32), (ks % budget).astype(jnp.int32)


timeit("packed i64 single-key sort", packed_sort, tile, splat_of_pair)


def seg_layout(tile_sorted, splat_sorted):
    tile_ids = jnp.arange(num_tiles + 1, dtype=jnp.int32)
    starts = jnp.searchsorted(tile_sorted, tile_ids, side="left").astype(jnp.int32)
    raw_count = starts[1:] - starts[:-1]
    tile_count = jnp.minimum(raw_count, cfg.tile_capacity)
    chunk = cfg.chunk
    padded = -(-tile_count // chunk) * chunk
    aligned_start = jnp.concatenate([jnp.zeros((1,), jnp.int32), jnp.cumsum(padded).astype(jnp.int32)])
    p_pad = -(-(budget + num_tiles * (chunk - 1) + chunk) // chunk) * chunk
    tile_safe = jnp.minimum(tile_sorted, num_tiles - 1)
    pos_in_tile = jnp.arange(budget, dtype=jnp.int32) - starts[:-1][tile_safe]
    keep = (tile_sorted < num_tiles) & (pos_in_tile < tile_count[tile_safe])
    dest = jnp.where(keep, aligned_start[tile_safe] + pos_in_tile, p_pad)
    pair_splat = jnp.full((p_pad,), N, dtype=jnp.int32).at[dest].set(splat_sorted, mode="drop")
    return pair_splat, aligned_start[:-1], tile_count


timeit("segment layout + scatter", seg_layout, tile_sorted, splat_sorted)
