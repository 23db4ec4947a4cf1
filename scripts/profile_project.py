"""Why does project_splats cost ~10 ms at 1M splats (roofline ~1 ms)?"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import gsplat_tpu as gt
from gsplat_tpu.ops.projection import project_splats

N = 1_000_000
splats = gt.random_splats(jax.random.PRNGKey(0), N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=1920, height=1080)

def probe(r):
    float(jax.tree.leaves(r)[0].ravel()[0])

def timeit(name, fn, *args, iters=10):
    jf = jax.jit(fn); r = jf(*args); probe(r)
    t0 = time.perf_counter()
    for _ in range(iters): r = jf(*args)
    probe(r)
    print(f"{name:40s} {(time.perf_counter()-t0)/iters*1000:9.2f} ms")

timeit("project sh3 tight", lambda s: project_splats(s, cam, 3, tight_footprint=True), splats)
timeit("project sh3", lambda s: project_splats(s, cam, 3), splats)
timeit("project sh0", lambda s: project_splats(s, cam, 0), splats)
timeit("noop passthrough sum", lambda s: jnp.stack([s.pos[0]]*16), splats)
timeit("elementwise x100 on (1M,)", lambda s: sum(s.pos[0]*k for k in range(1,101)), splats)
timeit("read sh sum", lambda s: jnp.sum(s.sh, axis=0), splats)
timeit("rtt floor (tiny)", lambda s: s.opacity[:8]*2.0, splats)
