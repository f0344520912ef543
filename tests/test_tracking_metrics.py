"""Internal tracking evaluator (AMOTA/AMOTP) — closure + hand-computed
fixtures pinning the tracking_nips_2019 restatement (tracking/metrics.py).

Expected values are derived on paper from the protocol:
  MOTAR(th) = max(0, 1 - (IDS + FP + FN - (1-r)P) / (rP)),  r = TP/P
  thresholds = scores achieving the 40 target recalls linspace(0.1, 1);
  unachievable targets contribute worst values (MOTAR 0, MOTP 2.0).
"""
import numpy as np
import pytest

from toc3d_tpu.tracking.metrics import (evaluate_tracking, MotAccumulator,
                                        NUM_THRESHOLDS)


def box(x, y, name="car", tid="t0", score=None):
    b = {"translation": [float(x), float(y), 0.0], "tracking_name": name,
         "tracking_id": tid}
    if score is not None:
        b["tracking_score"] = float(score)
    return b


def run(gt_frames, pred_frames, tokens=None):
    tokens = tokens or sorted(gt_frames)
    return evaluate_tracking(gt_frames, pred_frames, [tokens])


def test_closure_perfect_tracks():
    """Identical predictions with stable ids -> AMOTA 1.0, AMOTP 0.0."""
    gt, pred = {}, {}
    for t in range(3):
        tok = f"f{t}"
        gt[tok] = [box(t, 0, tid="g1"), box(t, 10, tid="g2")]
        pred[tok] = [box(t, 0, tid="p1", score=0.9),
                     box(t, 10, tid="p2", score=0.8)]
    m = run(gt, pred)
    assert m["AMOTA"] == pytest.approx(1.0)
    assert m["AMOTP"] == pytest.approx(0.0)


def test_false_positives_halve_motar_above_their_threshold():
    """2 GT tracks (scores .9/.8) + 1 far FP (score .85) every frame.

    Hand computation under devkit-exact INTERPOLATED thresholds
    (compute_thresholds uses np.interp over (recall, score-desc)):
    TP scores = 3x0.9 + 3x0.8, P = 6. Recall targets <= 0.5 (18 of 40)
    -> th 0.9 (only p1 kept: r=0.5, FN exactly offset by (1-r)P, MOTAR 1).
    Targets k=18..20 (r=0.515..0.562) interpolate to th in (0.85, 0.9)
    -> same MOTAR 1. k=21..24 interpolate to th in (0.8, 0.85): p1+px
    kept -> FP=3, matches=3, miss=3, r=0.5, nom=3+3-3=3, den=3 -> MOTAR 0.
    k=25..39 (15 targets) -> th 0.8, all kept: r=1, MOTAR = 1-3/6 = 0.5.
    AMOTA = (21*1 + 4*0 + 15*0.5)/40 = 0.7125.
    """
    gt, pred = {}, {}
    for t in range(3):
        tok = f"f{t}"
        gt[tok] = [box(t, 0, tid="g1"), box(t, 10, tid="g2")]
        pred[tok] = [box(t, 0, tid="p1", score=0.9),
                     box(t, 10, tid="p2", score=0.8),
                     box(t, 30, tid="px", score=0.85)]
    m = run(gt, pred)
    assert m["AMOTA"] == pytest.approx((21 + 15 * 0.5) / NUM_THRESHOLDS)


def test_id_switch_costs_one_over_p():
    """1 GT track over 4 frames, pred id changes once mid-scene:
    IDS=1, P=4, r=1 -> MOTAR = 1 - 1/4 = 0.75 at every threshold."""
    gt, pred = {}, {}
    for t in range(4):
        tok = f"f{t}"
        gt[tok] = [box(0, 0, tid="g1")]
        pid = "a" if t < 2 else "b"
        pred[tok] = [box(0, 0, tid=pid, score=1.0)]
    m = run(gt, pred)
    assert m["AMOTA"] == pytest.approx(0.75)
    assert m["per_class"]["car"]["motar"][0] == pytest.approx(0.75)


def test_unreachable_recall_contributes_worst_values():
    """Detections in only 2 of 4 frames: max recall 0.5. The 18 targets
    <= 0.5 score MOTAR 1 / MOTP 0, the other 22 get worst (0, 2.0):
    AMOTA = 18/40 = 0.45, AMOTP = 22*2/40 = 1.1."""
    gt, pred = {}, {}
    for t in range(4):
        tok = f"f{t}"
        gt[tok] = [box(0, 0, tid="g1")]
        pred[tok] = [box(0, 0, tid="a", score=1.0)] if t < 2 else []
    m = run(gt, pred)
    assert m["AMOTA"] == pytest.approx(18 / 40)
    assert m["AMOTP"] == pytest.approx(22 * 2.0 / 40)


def test_amotp_is_mean_tp_distance():
    """Predictions offset 1.0 m (inside the 2 m gate): AMOTP 1.0, AMOTA 1."""
    gt, pred = {}, {}
    for t in range(3):
        tok = f"f{t}"
        gt[tok] = [box(t, 0, tid="g1")]
        pred[tok] = [box(t, 1.0, tid="a", score=1.0)]
    m = run(gt, pred)
    assert m["AMOTA"] == pytest.approx(1.0)
    assert m["AMOTP"] == pytest.approx(1.0)


def test_class_averaging():
    """AMOTA averages equally over classes with GT (car 1.0, bus 0.75)."""
    gt, pred = {}, {}
    for t in range(4):
        tok = f"f{t}"
        gt[tok] = [box(0, 0, "car", "g1"), box(0, 20, "bus", "g2")]
        pid = "a" if t < 2 else "b"
        pred[tok] = [box(0, 0, "car", "c1", 1.0),
                     box(0, 20, "bus", pid, 1.0)]
    m = run(gt, pred)
    assert m["per_class"]["car"]["amota"] == pytest.approx(1.0)
    assert m["per_class"]["bus"]["amota"] == pytest.approx(0.75)
    assert m["AMOTA"] == pytest.approx(0.875)


def test_sticky_matching_prevents_spurious_switch():
    """Two GT tracks cross paths; sticky prior correspondences keep the
    original pairing even when the crossed assignment is nearer overall."""
    acc = MotAccumulator()
    # frame 0: g1 at 0, g2 at 1.0; hyps at the same spots
    acc.update([box(0, 0, tid="g1"), box(0, 1.0, tid="g2")],
               [box(0, 0, tid="a", score=1.0),
                box(0, 1.0, tid="b", score=1.0)])
    # frame 1: tracks converge to 0.4/0.6 — swapped Hungarian would be
    # cheaper is irrelevant: prior pairs are feasible and must persist
    acc.update([box(0, 0.4, tid="g1"), box(0, 0.6, tid="g2")],
               [box(0, 0.6, tid="a", score=1.0),
                box(0, 0.4, tid="b", score=1.0)])
    assert acc.n_switches == 0
    assert acc.n_matches == 4


def test_miss_and_fp_counting():
    acc = MotAccumulator()
    acc.update([box(0, 0, tid="g1"), box(0, 50, tid="g2")],
               [box(0, 0, tid="a", score=1.0),
                box(0, 100, tid="c", score=1.0)])
    assert acc.n_matches == 1
    assert acc.n_miss == 1     # g2 unmatched
    assert acc.n_fp == 1       # c unmatched
