"""Round-5 fine-grained on-chip decomposition of the fwd+bwd frame glue.

Times each sub-piece of ``bin_splats`` (with grad map) and the VJP tail as
isolated jitted functions at the production 1M/1080p operating point, to rank
structural targets after the per-pair-DMA refutation
(scripts/profile_dma_gather.py).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import bin_splats, grad_pad_size, tile_grid
from gsplat_tpu.ops.pallas.composite import (
    _build_kernels, _gather_payload, C_PAD,
)
from gsplat_tpu.ops.pallas.segsum import pad_pairs, segsum_by_splat
from gsplat_tpu.ops.projection import project_splats
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = 1_000_000
W, H = 1920, 1080
key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.tune_pair_budget(splats, cam, gt.RenderConfig(), headroom=1.02)
budget = cfg.pair_budget_override
print("budget:", budget)
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)
num_tiles = nty * ntx


def probe(r):
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(r):
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    float(acc)


def timeit(name, fn, *args, iters=6):
    f = jax.jit(fn)
    r = f(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:46s} {dt:9.2f} ms", flush=True)
    return f(*args)


proj = jax.jit(
    lambda s: sort_by_depth(
        sanitize_projected(
            project_splats(s, cam, cfg.sh_order, tight_footprint=True)
        )
    )
)(splats)
binned = jax.jit(
    lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True)
)(proj)

# ---- binning sub-pieces ----
from gsplat_tpu.ops.binning import _tile_extents


def extents_cumsum(p):
    counts, nx, tx0, ty0 = _tile_extents(
        p.fields, W, H, cfg, jnp.zeros((), jnp.int32)
    )
    cum = jnp.cumsum(counts)
    return cum, nx, tx0, ty0


cum_out = timeit("extents + cumsum (N)", extents_cumsum, proj)


def marks_cummax(p):
    counts, _, _, _ = _tile_extents(p.fields, W, H, cfg, jnp.zeros((), jnp.int32))
    cum = jnp.cumsum(counts)
    offsets = cum - counts
    splat_ids = jnp.arange(N, dtype=jnp.int32)
    marks = jnp.zeros((budget,), jnp.int32).at[offsets].max(
        splat_ids + 1, mode="drop"
    )
    return jnp.minimum(jax.lax.cummax(marks) - 1, N - 1)


timeit("(+) marks scatter-max + cummax (P)", marks_cummax, proj)

# expansion gather: 8 rows x budget queries (duplicate-heavy)
s_safe = jnp.maximum(jax.jit(marks_cummax)(proj), 0)
rows8 = proj.fields[0:8]


def exp_gather(r, s):
    return r[:, s]


timeit("expansion gather (8 rows x P)", exp_gather, rows8, s_safe)

# key sort with and without the eidx payload
keys = jax.random.randint(jax.random.PRNGKey(2), (budget,), 0, 2**30, jnp.int32)
pair_idx = jnp.arange(budget, dtype=jnp.int32)
timeit("key sort (1-array)", lambda k: jax.lax.sort(k), keys)
timeit("key sort (+eidx payload)",
       lambda k, e: jax.lax.sort((k, e), num_keys=1), keys, pair_idx)
timeit("inversion sort (eidx, dest)",
       lambda k, e: jax.lax.sort((k, e), num_keys=1), keys, pair_idx)

# ---- VJP tail sub-pieces ----
g_pad = grad_pad_size(budget, num_tiles, cfg.chunk)
d_grad_space = jax.random.normal(jax.random.PRNGKey(3), (C_PAD, g_pad), jnp.float32)
p_q = pad_pairs(budget)
dest = binned.dest_of_exp
keep = dest >= 0
q = jnp.where(keep, dest, ~dest)
if p_q != budget:
    pad = p_q - budget
    q = jnp.concatenate([q, jnp.zeros((pad,), jnp.int32)])
    keep_p = jnp.concatenate([keep, jnp.zeros((pad,), bool)])
else:
    keep_p = keep


def readback(dg, qq, kk):
    d8 = jnp.where(kk[None, :], dg[0:8][:, qq], 0.0)
    daux = jnp.where(kk[None, :], dg[8:10][:, qq], 0.0)
    return d8, daux


timeit("grad readback 8+2-row gather (P_q)", readback, d_grad_space, q, keep_p)

d8, daux = jax.jit(readback)(d_grad_space, q, keep_p)
rank_f = binned.exp_rank.astype(jnp.float32)
if p_q != budget:
    rank_f = jnp.concatenate([rank_f, jnp.full((p_q - budget,), -1.0, jnp.float32)])
aux = jnp.concatenate([daux[0:1], rank_f[None, :]], axis=0)


def seg(d8_, aux_, off, cnt):
    return segsum_by_splat(d8_, aux_, off, cnt, False)


timeit("segsum (MXU one-hot)", seg, d8, aux, binned.exp_offsets, binned.exp_counts)

# ---- kernels alone ----
payload = jax.jit(lambda f, ps: _gather_payload(f[:10], ps))(
    proj.fields, binned.pair_splat
)
timeit("payload gather (10-row x P)",
       lambda f, ps: _gather_payload(f[:10], ps), proj.fields, binned.pair_splat)

fwd_call, fwd_chk_call, bwd_call = _build_kernels(
    nty, ntx, payload.shape[1], g_pad, cfg, False
)
zero_row = jnp.zeros((2,), jnp.int32)
timeit("fwd kernel", lambda pay: fwd_call(
    binned.tile_base, binned.tile_phi, binned.tile_span, zero_row, pay)[0],
    payload)
out_chk = timeit("fwd kernel (+checkpoints)", lambda pay: fwd_chk_call(
    binned.tile_base, binned.tile_phi, binned.tile_span, zero_row, pay),
    payload)
_, used, tchk = out_chk
g_img = jnp.ones((nty, ntx, 4, 8, 128), jnp.float32)
timeit("bwd kernel", lambda pay, g, t: bwd_call(
    binned.tile_base, binned.tile_phi, binned.tile_span, used,
    binned.grad_base, zero_row, pay, g, t,
    jnp.zeros((C_PAD, g_pad), jnp.float32)),
    payload, g_img, tchk)
