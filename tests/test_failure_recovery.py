"""Failure-recovery harness: crash a training process mid-run, restart it,
and verify the resumed run is bit-identical to an uninterrupted one.

The reference's failure philosophy is degrade-don't-crash for data errors
(``gsplat_plugin/src/GR_GSplat.C:309-312``); it has no training and no
recovery story.  SURVEY.md §5 prescribes checkpoint-restart for the training
layer (JAX has no elastic membership) — this is the harness that proves the
restart path actually works from a hard kill (``os._exit``), not just that
checkpoints round-trip in-process.
"""

import os
import subprocess
import sys

import numpy as np

_WORKER = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fr_worker.py")


def _run(workdir, steps, crash_at=None, timeout=600):
    cmd = [sys.executable, _WORKER, str(workdir), "--steps", str(steps)]
    if crash_at is not None:
        cmd += ["--crash-at", str(crash_at)]
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    return subprocess.run(
        cmd, capture_output=True, text=True, timeout=timeout, env=env
    )


def test_crash_restart_matches_uninterrupted(tmp_path):
    steps, crash_at = 6, 2

    # Baseline: uninterrupted run.
    base_dir = tmp_path / "base"
    base_dir.mkdir()
    r = _run(base_dir, steps)
    assert r.returncode == 0, r.stderr
    assert "fresh start" in r.stdout

    # Crash run: dies via os._exit right after checkpointing step 2.
    crash_dir = tmp_path / "crash"
    crash_dir.mkdir()
    r1 = _run(crash_dir, steps, crash_at=crash_at)
    assert r1.returncode == 17, (r1.returncode, r1.stderr)
    assert not (crash_dir / "final.npz").exists()

    # Restart: restores step 2, resumes at 3, finishes.
    r2 = _run(crash_dir, steps)
    assert r2.returncode == 0, r2.stderr
    assert f"restored step {crash_at}, resuming at {crash_at + 1}" in r2.stdout
    # No recomputation of already-done steps.
    assert f"step {crash_at} loss" not in r2.stdout
    assert f"step {crash_at + 1} loss" in r2.stdout

    # The resumed parameters are bit-identical to the uninterrupted run's
    # (same optimizer states restored exactly, deterministic CPU math).
    a = np.load(base_dir / "final.npz")
    b = np.load(crash_dir / "final.npz")
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)
