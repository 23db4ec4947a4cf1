"""A/B full fwd+bwd frame time: default vs tuned pair budget; d_exp gather
variants — all in one process so chip/clock variance can't confound."""

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
    return r


cfg0 = gt.RenderConfig()
cfg1 = gt.tune_pair_budget(splats, cam, cfg0)
print("tuned budget:", cfg1.pair_budget_override,
      "default:", cfg0.pair_budget(N), flush=True)


def fb(cfg):
    def f(s):
        def loss(s_):
            return jnp.sum(gt.render(s_, cam, cfg, backend="pallas")[..., :3])
        return jax.grad(loss)(s)
    return f


timeit("FULL fwd+bwd default budget", fb(cfg0), splats)
timeit("FULL fwd+bwd tuned budget", fb(cfg1), splats)
timeit("FULL fwd+bwd default budget (again)", fb(cfg0), splats)
print("done", flush=True)
