"""Closed-loop correctness: training must produce a detector that DETECTS.

Drives tools/traineval_closedloop.py — the full loop the reference proves
with real-data training logs (training_logs/ToC3D_fast.log ends in val
mAP/NDS): sampler -> jitted train step -> mid-run checkpoint resume ->
streaming eval -> submission -> internal evaluator.

Two tiers (VERDICT r4 #1/#7 — the old single 8k-iter in-suite test asserted
mAP > 0.05 at the steepest, highest-variance point of the learning curve
and failed on a clean rerun; a correctness proof must assert where the
curve is FLAT):

* smoke (in-suite, slow-marked, ~4 min on TPU): 150 iters — proves the
  LOOP (returncode, resume, eval plumbing, loss falling) with no mAP bar;
  at 150 iters mAP is 0 by construction (TRAINEVAL short-run records).
* full (opt-in via TOC3D_CLOSEDLOOP_FULL=1, ~85 min on TPU): 20k iters of
  the recorded recipe, asserting mAP_present > 0.3 — the saturation-free
  measure (devkit mAP averages all 10 classes; 3 present -> hard 0.3
  ceiling). Measured 0.98 at 20k+ (diag_r04 breakdown in PERF.md), so the
  bar carries >3x margin, per VERDICT r4 #1.

Runtime note: the spawned tool runs on whatever platform the interpreter
resolves (this box's sitecustomize pins the axon TPU; JAX_PLATFORMS env is
ignored at interpreter start). Don't run concurrently with benchmarks.
The recorded full-scale trajectories live in TRAINEVAL_r04.json /
TRAINEVAL_r05.json.
"""
import json
import shutil
import subprocess
import sys
import os

import pytest

pytestmark = pytest.mark.slow

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(tmp_path, iters, extra=()):
    out = tmp_path / "traineval.json"
    cmd = [sys.executable, os.path.join(REPO, "tools",
                                        "traineval_closedloop.py"),
           "--config", "tiny", "--iters", str(iters),
           "--out", str(out), "--data-dir", str(tmp_path / "data"),
           *extra]
    r = subprocess.run(cmd, capture_output=True, text=True, timeout=9000)
    assert r.returncode == 0, r.stdout[-3000:] + r.stderr[-3000:]
    keep = os.environ.get("TOC3D_CLOSEDLOOP_KEEP")
    if keep:  # archive the trajectory (e.g. TRAINEVAL_r05.json)
        shutil.copy(out, keep)
    return json.loads(out.read_text())


def test_closedloop_smoke(tmp_path):
    """The loop itself: train -> checkpoint resume -> eval, loss falling."""
    rec = _run(tmp_path, 150, ["--eval-points", "1"])
    assert rec["resumed"] is True
    traj = rec["map_trajectory"]
    assert traj[0]["iter"] == 0 and traj[-1]["iter"] == 150
    for point in traj:  # eval plumbing produced finite metrics
        assert 0.0 <= point["mAP"] <= 1.0 and 0.0 <= point["NDS"] <= 1.0
    # loss falls decisively even in 150 iters (records: 75.9 -> 30.2)
    assert rec["loss_last5_mean"] < 0.7 * rec["loss_first5_mean"], rec


@pytest.mark.skipif(not os.environ.get("TOC3D_CLOSEDLOOP_FULL"),
                    reason="~85 min training run; set TOC3D_CLOSEDLOOP_FULL=1")
def test_tiny_overfit_map_climbs(tmp_path):
    """Full overfit proof at the FLAT part of the curve (20k iters)."""
    rec = _run(tmp_path, 20000,
               ["--lr", "1.5e-3", "--warmup", "50", "--batch-size", "8",
                "--scenes", "8", "--objects", "3", "--frames-per-scene", "8",
                "--eval-points", "2"])
    assert rec["resumed"] is True
    final = rec["map_trajectory"][-1]
    # measured 0.98 mAP_present at 20k (3-class ceiling-free overfit
    # saturation); 0.3 bar = >3x margin. 10-class mAP ceiling is 0.3.
    assert final["mAP_present"] > 0.3, final
    assert final["mAP"] > 0.1, final
    assert rec["loss_last5_mean"] < rec["loss_first5_mean"]
