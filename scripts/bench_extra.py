"""BENCH_EXTRA battery: the off-headline operating points, one honest JSON.

Runs bench.py (same harness, same parity/drop accounting) across:
  * 1M uniform fwd+bwd / fwd-only / wireframe (headline scene);
  * 1M TRAINED-statistics scene fwd+bwd (BASELINE config 3 "captured
    scene": log-normal scales, near-transparent tail, clustered positions
    — needs the measured 5.6M-pair budget and 64k tile capacity for zero
    drops);
  * the full 2^23 = 8,388,608-splat envelope (the reference's hard budget,
    include/GSplatRenderer.h:26): fwd+bwd, fwd-only, wireframe — all at
    zero dropped pairs.

Usage: python scripts/bench_extra.py [--out BENCH_EXTRA_r05.json]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNS = [
    ("uniform_1m_fwd_bwd", ["--skip-parity"]),
    ("uniform_1m_fwd", ["--fwd-only", "--skip-parity"]),
    ("uniform_1m_wireframe", ["--wireframe", "--iters", "5"]),
    ("trained_1m_fwd_bwd",
     ["--scene", "trained", "--capacity", "65536", "--chunk", "256",
      "--iters", "5", "--skip-parity"]),
    ("envelope_2pow23_fwd_bwd",
     ["--splats", "8388608", "--capacity", "21760", "--chunk", "256",
      "--iters", "5", "--skip-parity"]),
    ("envelope_2pow23_fwd",
     ["--splats", "8388608", "--capacity", "21760", "--chunk", "256",
      "--iters", "5", "--fwd-only", "--skip-parity"]),
    ("envelope_2pow23_wireframe",
     ["--splats", "8388608", "--wireframe", "--iters", "3"]),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH_EXTRA_r05.json")
    args = ap.parse_args()
    out = {
        "note": "all beauty-pass rows use the production config "
                "(payload packed, eps 1e-3 < 1/4 8-bit LSB, tuned budget) "
                "and report dropped_pairs so every number is zero-drop "
                "honest; sol_fraction = fraction of the "
                "modelled per-stage hardware floor (utils/sol.py)",
    }
    for name, extra in RUNS:
        cmd = [sys.executable, os.path.join(ROOT, "bench.py")] + extra
        r = subprocess.run(cmd, capture_output=True, text=True, cwd=ROOT,
                           timeout=900)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            out[name] = json.loads(line)
        except Exception:
            out[name] = {"error": (r.stderr or line)[-400:]}
        print(name, "->", line[:160], flush=True)
    with open(os.path.join(ROOT, args.out), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"written": args.out}))


if __name__ == "__main__":
    main()
