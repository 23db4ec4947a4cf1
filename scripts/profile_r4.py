"""Round-4 on-chip A/Bs on the full fwd+bwd frame: compositing chunk size,
early-termination eps, and pair-budget headroom (all config knobs)."""
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gsplat_tpu as gt

N = 1_000_000
W, H = 1920, 1080
key = jax.random.PRNGKey(0)
splats = gt.random_splats(key, N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=W, height=H)


def probe(r):
    acc = jnp.float32(0)
    for leaf in jax.tree_util.tree_leaves(r):
        acc = acc + jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
    float(acc)


def timeit(name, cfg, iters=8):
    def loss(s):
        return jnp.sum(gt.render(s, cam, cfg, backend="pallas")[..., :3])
    f = jax.jit(jax.grad(loss))
    r = f(splats)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(splats)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:52s} {dt:9.2f} ms", flush=True)


base = gt.tune_pair_budget(splats, cam, gt.RenderConfig())
print("tuned budget (headroom 1.2):", base.pair_budget_override, flush=True)
timeit("base chunk=128 eps=1e-4 headroom=1.2", base)
tight = gt.tune_pair_budget(splats, cam, gt.RenderConfig(), headroom=1.02)
print("tuned budget (headroom 1.02):", tight.pair_budget_override, flush=True)
timeit("headroom=1.02", tight)
timeit("chunk=256", dataclasses.replace(tight, chunk=256))
timeit("chunk=64", dataclasses.replace(tight, chunk=64))
timeit("eps=1e-3", dataclasses.replace(tight, transmittance_eps=1e-3))
timeit("eps=1e-3 chunk=64", dataclasses.replace(tight, transmittance_eps=1e-3, chunk=64))
