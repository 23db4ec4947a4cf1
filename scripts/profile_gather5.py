"""Round-3 dexp redesign measurements: 8+1 row split vs 9-row variants.

Production dexp gather: 9 rows from a (16, g_pad) f32 source (pads to 16
sublanes, 233 MB => worst tier, 42.4 ms at 3.1M queries).  Candidates:
  A. production: take rows 0:9 of (16, g_pad)
  B. take rows 0:8 of (16, g_pad)  (8-aligned slice => fast tier?)
  C. 1-row gather of row 8 (the dp2 row after reorder)
  D. B + C fused in one jit (the proposed 8+1 split)
  E. 9-row gather from a materialized (9-row-only) source
  F/G/H. tuned-budget sizes of A/B/C
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

BUDGET = 3_000_000          # default pair budget at 1M splats
G_PAD = 3_654_784           # grad_pad_size(3M, 2040 tiles, 128)
BUDGET_T = 2_752_512        # tuned budget (1.2 headroom, 2^17 bucket)
G_PAD_T = 3_407_296

key = jax.random.PRNGKey(0)


def mk(rows, cols):
    return jax.random.normal(key, (rows, cols), jnp.float32)


def mkq(n, cols):
    return jax.random.randint(jax.random.PRNGKey(1), (n,), 0, cols, jnp.int32)


def timeit(name, fn, *args, iters=10):
    f = jax.jit(fn)
    r = f(*args)
    jax.tree.map(lambda x: float(x.ravel()[0]), r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    jax.tree.map(lambda x: float(x.ravel()[0]), r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:58s} {dt:8.2f} ms", flush=True)


for budget, g_pad, tag in [(BUDGET, G_PAD, "dflt"), (BUDGET_T, G_PAD_T, "tuned")]:
    src = mk(16, g_pad)
    q = mkq(budget, g_pad)
    keep = q > (g_pad // 4)  # ~75% keep, like real dropped-pair masks
    timeit(f"[{tag}] A 9-row of (16,{g_pad//1000}k), {budget//1000}k q",
           lambda s, qq, k: jnp.where(k[None], s[:9][:, qq], 0.0), src, q, keep)
    timeit(f"[{tag}] B 8-row of (16,...)",
           lambda s, qq, k: jnp.where(k[None], s[:8][:, qq], 0.0), src, q, keep)
    timeit(f"[{tag}] C 1-row (row 8)",
           lambda s, qq, k: jnp.where(k, s[8][qq], 0.0), src, q, keep)
    timeit(f"[{tag}] C2 1-row from 1-D (g_pad,) source",
           lambda s, qq, k: jnp.where(k, s[qq], 0.0), src[8], q, keep)
    timeit(f"[{tag}] D 8+1 split (one jit)",
           lambda s, qq, k: (jnp.where(k[None], s[:8][:, qq], 0.0),
                             jnp.where(k, s[8][qq], 0.0)), src, q, keep)
    timeit(f"[{tag}] E 9-row from materialized (9,...) source",
           lambda s, qq, k: jnp.where(k[None], s[:, qq], 0.0),
           jnp.array(src[:9]), q, keep)
    timeit(f"[{tag}] E2 2-row of (2,...)",
           lambda s, qq, k: jnp.where(k[None], s[:, qq], 0.0),
           jnp.array(src[:2]), q, keep)
print("done", flush=True)

# --- addendum: 2-row slices at various offsets of a 16-row source ---
for budget, g_pad, tag in [(3_000_000, 3_654_784, "dflt"), (2_424_832, 2_852_992, "tight")]:
    src = mk(16, g_pad)
    q = mkq(budget, g_pad)
    keep = q > (g_pad // 4)
    timeit(f"[{tag}] 2-row slice rows 8:10 of (16,{g_pad//1000}k), {budget//1000}k q",
           lambda s, qq, k: jnp.where(k[None], s[8:10][:, qq], 0.0), src, q, keep)
    timeit(f"[{tag}] 8-row slice rows 0:8",
           lambda s, qq, k: jnp.where(k[None], s[:8][:, qq], 0.0), src, q, keep)
    timeit(f"[{tag}] both in one jit (the production shape)",
           lambda s, qq, k: (jnp.where(k[None], s[:8][:, qq], 0.0),
                             jnp.where(k[None], s[8:10][:, qq], 0.0)), src, q, keep)
print("done2", flush=True)
