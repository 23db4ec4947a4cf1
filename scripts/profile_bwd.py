"""Micro-profile of the backward rasterization chain on the real chip."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import bin_splats, grad_pad_size, tile_grid
from gsplat_tpu.ops.pallas.composite import _build_kernels, _pad_rows
from gsplat_tpu.ops.pallas.segsum import segsum_by_splat
from gsplat_tpu.ops.projection import project_splats
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
W, H = 1920, 1080

key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.RenderConfig(transmittance_eps=float(__import__("os").environ.get("TEPS", "1e-4")))


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
    print(f"{name:40s} {dt:9.2f} ms")
    return r


proj = jax.jit(
    lambda s: sort_by_depth(sanitize_projected(project_splats(s, cam, cfg.sh_order, tight_footprint=True)))
)(splats)
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)
binned = jax.jit(
    lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True)
)(proj)

fields = proj.fields[:10]
payload = jax.jit(lambda f, ps: _pad_rows(f[:, ps]))(fields, binned.pair_splat)
p_pad = payload.shape[1]
budget = binned.dest_of_exp.shape[0]
g_pad = grad_pad_size(budget, nty * ntx, cfg.chunk)
row_off = jnp.zeros((1,), jnp.int32)

fwd_call, fwd_chk_call, bwd_call = _build_kernels(nty, ntx, p_pad, g_pad, cfg, False)

timeit("payload gather (10-row+pad)", lambda f, ps: _pad_rows(f[:, ps]), fields, binned.pair_splat)
timeit(
    "fwd kernel (no checkpoints)",
    lambda pay: fwd_call(binned.tile_base, binned.tile_phi, binned.tile_span, row_off, pay)[0],
    payload,
)
out, used, tchk = timeit(
    "fwd kernel (with T checkpoints)",
    lambda pay: fwd_chk_call(binned.tile_base, binned.tile_phi, binned.tile_span, row_off, pay),
    payload,
)

g = jnp.ones_like(out)
d_grad = timeit(
    "bwd kernel",
    lambda pay, gg, t: bwd_call(
        binned.tile_base, binned.tile_phi, binned.tile_span, used,
        binned.grad_base, row_off, pay, gg, t,
        jnp.zeros((16, g_pad), jnp.float32),
    ),
    payload, g, tchk,
)

from gsplat_tpu.ops.pallas.segsum import pad_pairs as segsum_pad_pairs


def _exp_gather(dg):
    keep = binned.dest_of_exp >= 0
    q = jnp.where(keep, binned.dest_of_exp, ~binned.dest_of_exp)
    rank_f = binned.exp_rank.astype(jnp.float32)
    p_q = segsum_pad_pairs(budget)
    if p_q != budget:
        pad = p_q - budget
        q = jnp.concatenate([q, jnp.zeros((pad,), jnp.int32)])
        keep = jnp.concatenate([keep, jnp.zeros((pad,), bool)])
        rank_f = jnp.concatenate([rank_f, jnp.full((pad,), -1.0, jnp.float32)])
    d8 = jnp.where(keep[None, :], dg[0:8][:, q], 0.0)
    daux = jnp.where(keep[None, :], dg[8:10][:, q], 0.0)
    aux = jnp.concatenate([daux[0:1], rank_f[None, :]], axis=0)
    return d8, aux


d8, aux = timeit("d_exp gather (grad space -> exp)", _exp_gather, d_grad)
timeit(
    "segsum_by_splat",
    lambda a, b: segsum_by_splat(a, b, binned.exp_offsets, binned.exp_counts, False),
    d8, aux,
)
