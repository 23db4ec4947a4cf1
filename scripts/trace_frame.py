"""Perfetto trace of one fwd+bwd frame; prints top device ops by self time."""
import gzip, glob, json, os, sys, collections
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp
import gsplat_tpu as gt

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
splats = gt.random_splats(jax.random.PRNGKey(0), N, extent=1.2, scale_range=(0.002, 0.01), sh_scale=0.1)
cam = gt.make_camera(eye=[0.0, 0.4, 3.0], target=[0, 0, 0], width=1920, height=1080)
cfg = gt.RenderConfig()
if "--tune" in sys.argv:
    cfg = gt.tune_pair_budget(splats, cam, cfg)
    print("tuned budget:", cfg.pair_budget_override)

def loss(s):
    return jnp.sum(gt.render(s, cam, cfg, backend="pallas")[..., :3])
f = jax.jit(jax.grad(loss))
r = f(splats); jax.tree.map(lambda x: x.block_until_ready(), r)
float(jax.tree.leaves(r)[0].ravel()[0])

logdir = "/tmp/jtrace"
os.system(f"rm -rf {logdir}")
with jax.profiler.trace(logdir, create_perfetto_trace=True):
    for _ in range(2):
        r = f(splats)
    float(jax.tree.leaves(r)[0].ravel()[0])

traces = glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", traces)
if traces:
    with gzip.open(traces[0], "rt") as fh:
        data = json.load(fh)
    evs = [e for e in data.get("traceEvents", []) if e.get("ph") == "X"]
    # find device-side track(s): heuristics on pid/tid names
    names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    agg = collections.Counter()
    total = 0
    for e in evs:
        pname = names.get(e["pid"], "")
        if "TPU" in pname or "tpu" in pname or "/device" in pname.lower():
            agg[e["name"][:70]] += e.get("dur", 0)
            total += e.get("dur", 0)
    print(f"device total {total/1e3/2:.1f} ms/frame over {len(evs)} events; pnames={set(names.values())}")
    for name, dur in agg.most_common(30):
        print(f"{dur/1e3/2:9.2f} ms  {name}")
