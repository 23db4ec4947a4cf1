"""Decompose the rasterization tail (gather / fwd kernel / bwd kernel /
d_exp gather / segsum) and measure gather-split + dtype variants on-chip.

Findings drive the composite VJP layout (see ops/pallas/composite.py).
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
    C_USED,
    _build_kernels,
    _pad_rows,
)
from gsplat_tpu.ops.pallas.segsum import segsum_by_splat
from gsplat_tpu.ops.projection import project_splats
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
    print(f"{name:44s} {dt:9.2f} ms", flush=True)
    return f(*args)


san = jax.jit(
    lambda s: sort_by_depth(
        sanitize_projected(project_splats(s, cam, cfg.sh_order, tight_footprint=True))
    )
)(splats)
binned = jax.jit(
    lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True)
)(san)
nty, ntx = tile_grid(W, H, cfg.tile_h, cfg.tile_w)
fields10 = san.fields[:10]

# --- forward payload gather variants ---
timeit("fwd gather 10row one-op + pad (current)",
       lambda f, i: _pad_rows(f[:, i]), fields10, binned.pair_splat)
timeit("fwd gather 8+2 split + pad",
       lambda f, i: jnp.pad(
           jnp.concatenate([f[:8][:, i], f[8:][:, i]]), ((0, 6), (0, 0))
       ), fields10, binned.pair_splat)
timeit("fwd gather 8+2 bf16 + cvt + pad",
       lambda f, i: jnp.pad(
           jnp.concatenate(
               [f[:8].astype(jnp.bfloat16)[:, i],
                f[8:].astype(jnp.bfloat16)[:, i]]
           ).astype(jnp.float32),
           ((0, 6), (0, 0)),
       ), fields10, binned.pair_splat)

# --- kernel pieces ---
payload = jax.jit(lambda f, i: _pad_rows(f[:, i]))(fields10, binned.pair_splat)
g_pad = grad_pad_size(binned.dest_of_exp.shape[0], nty * ntx, cfg.chunk)
fwd_call, fwd_chk_call, bwd_call = _build_kernels(
    nty, ntx, payload.shape[1], g_pad, cfg, False
)
row0 = jnp.zeros((1,), jnp.int32)

out, used, tchk = timeit(
    "fwd kernel (checkpointing)",
    lambda pay: fwd_chk_call(
        binned.tile_base, binned.tile_phi, binned.tile_span, row0, pay
    ),
    payload,
)
g = jnp.ones_like(out)
d_grad_space = timeit(
    "bwd kernel",
    lambda pay, o, gg, tc, u: bwd_call(
        binned.tile_base, binned.tile_phi, binned.tile_span, u,
        binned.grad_base, row0, pay, o, gg, tc,
    ),
    payload, out, g, tchk, used,
)


def dexp_gather(dgs, dest):
    keep = dest >= 0
    q = jnp.where(keep, dest, ~dest)
    return jnp.where(
        keep[None, :],
        jnp.concatenate([dgs[:8][:, q], dgs[8:C_USED][:, q]]),
        0.0,
    )


d_exp = timeit("d_exp gather 8+2 (current)", dexp_gather, d_grad_space, binned.dest_of_exp)
timeit(
    "segsum",
    lambda de: segsum_by_splat(de[:9], binned.exp_offsets, binned.exp_counts, False)[:9],
    d_exp,
)
print("done", flush=True)
