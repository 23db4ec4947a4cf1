"""Gather locality cost model on the real chip.

The d_exp gather (grad space -> expansion order) runs at ~0.57 elem/cycle
while the payload gather (fields -> tile-sorted pairs) runs at ~1.2 — this
script isolates WHY: query *pattern* (ascending / segment-local / k-way-merge
like d_exp / random) and source width, at the bench scale (10 rows x 3.1M
queries).  Also probes a c64 (8-byte) gather as a row-halving trick.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

import gsplat_tpu as gt
from gsplat_tpu.ops.binning import bin_splats
from gsplat_tpu.ops.projection import project_splats
from gsplat_tpu.ops.rasterize_ref import sanitize_projected
from gsplat_tpu.ops.rasterize_tiles import sort_by_depth

N = 1_000_000
W, H = 1920, 1080

key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)
cfg = gt.RenderConfig()

proj = jax.jit(
    lambda s: sort_by_depth(sanitize_projected(project_splats(s, cam, cfg.sh_order, tight_footprint=True)))
)(splats)
binned = jax.jit(lambda p: bin_splats(p, W, H, cfg, with_tiles=False, with_grad_map=True))(proj)

budget = binned.dest_of_exp.shape[0]
keep = np.asarray(binned.dest_of_exp) >= 0
dest = np.asarray(binned.dest_of_exp)
q_dexp = jnp.asarray(np.where(keep, dest, ~dest).astype(np.int32))
g_pad = int(dest.max()) + 1
src_w = -(-g_pad // 128) * 128

rng = np.random.default_rng(0)
q_asc = jnp.arange(budget, dtype=jnp.int32) % src_w
q_rand = jnp.asarray(rng.integers(0, src_w, budget, dtype=np.int32))
q_pair = binned.pair_splat[:budget]  # the payload-gather pattern (into N cols)

src16 = jnp.zeros((16, src_w), jnp.float32) + jnp.arange(src_w, dtype=jnp.float32)
srcN = jnp.zeros((16, N), jnp.float32) + jnp.arange(N, dtype=jnp.float32)


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
    print(f"{name:48s} {dt:9.2f} ms")


g10 = lambda s, q: s[:10][:, q]
timeit("10row x 3.1M ascending (src 3.6M)", g10, src16, q_asc)
timeit("10row x 3.1M d_exp pattern (src 3.6M)", g10, src16, q_dexp)
timeit("10row x 3.1M random (src 3.6M)", g10, src16, q_rand)
timeit("10row x 3.1M pair pattern (src 1M)", g10, srcN, q_pair)
timeit("10row x 3.1M random (src 1M)", g10, srcN, q_rand % N)

# fewer rows scaling
timeit("5row x 3.1M d_exp pattern", lambda s, q: s[:5][:, q], src16, q_dexp)
timeit("1row x 3.1M d_exp pattern", lambda s, q: s[0][q], src16, q_dexp)

# 8-byte element gather: complex64 halves the row count if per-element cost
src_c = jax.jit(lambda s: jax.lax.complex(s[:5], s[5:10]))(src16)
timeit("5row c64 x 3.1M d_exp pattern", lambda s, q: s[:, q], src_c, q_dexp)
timeit("5row c64 x 3.1M pair pattern", lambda s, q: s[:, q],
       jax.jit(lambda s: jax.lax.complex(s[:5], s[5:10]))(srcN), q_pair)

# does query sortedness within blocks help? block-sorted d_exp
blk = 1 << 14
nb = -(-budget // blk)
pad = nb * blk - budget
qs = np.where(keep, dest, ~dest).astype(np.int32)
qs_blk = np.sort(np.pad(qs, (0, pad)).reshape(nb, blk), axis=1).reshape(-1)[:budget]
timeit("10row x 3.1M d_exp block(16k)-sorted", g10, src16, jnp.asarray(qs_blk))

# --- split-row variants: output sublane padding means a 10-row gather pays
# for 16 padded rows; two 5-row gathers pay 8+8 ---
def g55(s, q):
    return jnp.concatenate([s[:5][:, q], s[5:10][:, q]])
def g82(s, q):
    return jnp.concatenate([s[:8][:, q], s[8:10][:, q]])
timeit("5+5 split x 3.1M d_exp pattern", g55, src16, q_dexp)
timeit("8+2 split x 3.1M d_exp pattern", g82, src16, q_dexp)
timeit("8row x 3.1M d_exp pattern", lambda s, q: s[:8][:, q], src16, q_dexp)
timeit("2row x 3.1M d_exp pattern", lambda s, q: s[8:10][:, q], src16, q_dexp)
timeit("5+5 split x 3.1M pair pattern (src 1M)", g55, srcN, q_pair)
timeit("16row x 3.1M d_exp pattern", lambda s, q: s[:, q], src16, q_dexp)
# ascending-with-duplicates at 1M (the segsum take pattern)
q_dup = jnp.asarray(np.sort(rng.integers(0, N, N).astype(np.int32)))
timeit("10row x 1M ascending-dup (src 1M)", g10, srcN, q_dup)
timeit("10row x 1M random (src 1M)", g10, srcN, jnp.asarray(rng.integers(0, N, N, dtype=np.int32)))
