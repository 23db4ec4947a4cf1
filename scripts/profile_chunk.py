"""On-chip A/B: compositing chunk size (128 vs 256) on the full fwd+bwd
frame, plus the fused-kernel wireframe frame time at 1M splats."""

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


def timeit(name, fn, *args, iters=8):
    f = jax.jit(fn)
    r = f(*args)
    probe(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(*args)
    probe(r)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(f"{name:44s} {dt:9.2f} ms", flush=True)


def fb(cfg):
    def f(s):
        def loss(s_):
            return jnp.sum(gt.render(s_, cam, cfg, backend="pallas")[..., :3])
        return jax.grad(loss)(s)
    return f


timeit("fwd+bwd chunk=128 (default)", fb(gt.RenderConfig()), splats)
timeit("fwd+bwd chunk=256", fb(gt.RenderConfig(chunk=256)), splats)
timeit("wireframe 1M 1080p (fused kernel, fwd)",
       lambda s: gt.render_wireframe(s, cam, backend="pallas"), splats)
timeit("beauty fwd only (for comparison)",
       lambda s: gt.render(s, cam, gt.RenderConfig(), backend="pallas"), splats)
print("done", flush=True)
