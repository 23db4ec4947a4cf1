"""Speed-of-light model: the per-frame hardware floor of the render pipeline.

BASELINE's north star is kernels "at speed-of-light per chip"; this module
makes that falsifiable by pricing every pipeline stage against the hardware
unit that fundamentally bounds it, so the bench can report how far the
achieved frame is from the floor (``sol_ms`` + ``sol_fraction`` in
bench.py's JSON).  Derivation and per-stage discussion: ARCHITECTURE.md
("Speed of light").

Three kinds of floors, in decreasing hardness:

* **Hardware-architectural** — VPU issue rate × counted vector ops (the
  compositing kernels), HBM bytes / bandwidth (streaming stages), MXU
  MACs / peak (segsum).  These cannot be beaten on this chip by any
  implementation.
* **Hardware-unit measured** — the gather unit is element-sequential with
  no public spec; its floor is the unit's measured peak rate on this chip
  at our best access shape (8-row int32 gather, nearly-sorted queries —
  scripts/sol_calibrate.py).  A different algorithm could avoid a gather,
  but no gather can run faster.
* **Software floor (flagged)** — XLA's sort rate.  A faster TPU sort would
  need per-element scatter, which Mosaic's DMA model cannot express
  (128-lane HBM slice alignment — measured refutation in
  scripts/profile_dma_gather.py), so XLA's sort is the practical floor;
  its own hardware floor is only the HBM traffic of O(log n) passes.

Counted per-pair vector-op budgets come from the kernel source
(ops/pallas/composite.py): the forward hot loop is ~22 (8, 128) vreg ops
per pair (alpha math 15 + transmittance chain 2 + color FMAs 3 + unpack 2),
the backward ~45 (replay fill ~17 + gradient walk ~20 + chunk-end share
~8).  One (8, 128) vreg op processes all 1024 pixels of a tile, so
"pairs × ops" already counts the pixel dimension.
"""

from __future__ import annotations

# TPU v5e device constants.  Architectural numbers follow the public spec
# (jax-ml.github.io/scaling-book: 819 GB/s HBM, 197 bf16 TFLOP/s MXU,
# 8x128x4-ALU VPU at ~940 MHz); measured numbers from
# scripts/sol_calibrate.py on this chip.
V5E = {
    "name": "TPU v5e",
    "clock_hz": 0.94e9,
    "vpu_vreg_rate": 3.76e9,   # (8,128) vector ops/s: 4 ALUs x 940 MHz
    "hbm_bw": 819e9,           # B/s architectural (723 GB/s measured r+w)
    "mxu_bf16_flops": 1.97e14,
    "gather_rate": 1.41e9,     # element-fetches/s, measured peak (8-row,
                               # nearly-sorted int32 queries)
    "sort_rate": 3.23e8,       # sorted (key,payload) PAIRS/s, measured XLA
                               # sort at 2.36M int32 — software floor (the
                               # rate constant already includes moving the
                               # payload array)
}

# Counted vector-op budgets per pair (kernel source, see module docstring).
FWD_OPS_PER_PAIR = 22
BWD_OPS_PER_PAIR = 45
# Projection: ~250 scalar flops/splat across quat->cov->EWA->eigen->SH deg3,
# vectorized 1024 splats/vreg.
PROJ_OPS_PER_SPLAT = 250
# Splat parameter bytes (pos3 quat4 scale3 op1 color3 sh45 = 59 f32).
PARAM_BYTES = 59 * 4
FIELD_ROWS = 16
PAYLOAD_ROWS = 8  # packed production mode


def speed_of_light(
    n_splats: int,
    width: int,
    height: int,
    pair_budget: int,
    fwd_only: bool = False,
    device: dict = V5E,
) -> dict:
    """Per-stage floor milliseconds for one fwd(+bwd) frame.

    ``pair_budget``: the static pair count every pair-proportional stage
    actually walks (the tuned budget).  Returns ``{"sol_ms", "stages"}``;
    ``stages`` maps stage name -> (floor_ms, bounding unit).
    """
    n, p = float(n_splats), float(pair_budget)
    bw, vpu, gr, sr = (
        device["hbm_bw"], device["vpu_vreg_rate"],
        device["gather_rate"], device["sort_rate"],
    )
    tiles = -(-height // 32) * -(-width // 32)
    ms = 1e3
    stages = {}

    def add(name, seconds, unit):
        stages[name] = (seconds * ms, unit)

    # Forward path ---------------------------------------------------------
    add("project", max(n * PARAM_BYTES / bw, n * PROJ_OPS_PER_SPLAT / 1024 / vpu),
        "HBM/VPU")
    add("depth sort", n / sr, "sort (software floor)")
    add("field permute", 14 * n / gr, "gather unit")
    add("binning scans+scatter", 3 * (4 * (n + p)) / bw, "HBM")
    add("expansion gather", 8 * p / gr, "gather unit")
    add("pair key sort", p / sr, "sort (software floor)")
    add("payload gather", PAYLOAD_ROWS * p / gr, "gather unit")
    add("fwd kernel", p * FWD_OPS_PER_PAIR / vpu, "VPU issue rate")
    add("image unpack", 2 * (tiles * 4 * 1024 * 4) / bw, "HBM")
    if not fwd_only:
        # Backward path ----------------------------------------------------
        add("dest inversion sort", p / sr, "sort (software floor)")
        add("bwd kernel", p * BWD_OPS_PER_PAIR / vpu, "VPU issue rate")
        add("grad readback gather", PAYLOAD_ROWS * p / gr, "gather unit")
        # segsum: 3 bf16x3-split one-hot matmuls per chunk of 256 pairs x
        # (10 rows x 256 x 512 block) MACs
        add("segsum", (p / 256) * 3 * (10 * 256 * 512) * 2
            / device["mxu_bf16_flops"], "MXU")
        add("combine+proj bwd",
            max(2 * n * PARAM_BYTES / bw, n * PROJ_OPS_PER_SPLAT / 1024 / vpu),
            "HBM/VPU")
        add("cotangent unpermute", 10 * n / gr, "gather unit")

    total = sum(v for v, _ in stages.values())
    return {"sol_ms": total, "stages": stages}


def report(n, width, height, pair_budget, achieved_ms, fwd_only=False):
    """Bench-facing summary: floor, achieved, fraction."""
    m = speed_of_light(n, width, height, pair_budget, fwd_only)
    return {
        "sol_ms": round(m["sol_ms"], 2),
        "sol_fraction": round(m["sol_ms"] / achieved_ms, 4),
        "sol_device": V5E["name"],
    }
