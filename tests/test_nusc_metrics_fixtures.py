"""Adversarial devkit-parity fixtures for runtime/nusc_metrics.py.

Each fixture's expected value is derived ON PAPER from the devkit algorithm
(nuscenes/eval/detection/algo.py semantics, restated in the comments) using
closed-form precision/cummean curves — independent of the module's own
interpolation code. These pin exactly the semantics the round-1 closure
test never exercised: duplicate suppression, near-threshold matching, the
TP-error cummean-vs-confidence interpolation, attribute rules, velocity
errors, class-range filtering, and the barrier orientation period.
"""
import math

import numpy as np
import pytest

from toc3d_tpu.runtime.nusc_metrics import (accumulate, calc_ap, calc_tp,
                                            evaluate, DIST_THS)


def box(x, y, name="car", score=None, size=(1.0, 1.0, 1.0), yaw=0.0,
        vel=(0.0, 0.0), attr="", ego=None):
    b = {"translation": [float(x), float(y), 0.0], "size": list(size),
         "rotation": [math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)],
         "velocity": list(vel), "detection_name": name,
         "attribute_name": attr}
    if score is not None:
        b["detection_score"] = float(score)
    if ego is not None:
        b["ego_translation"] = list(ego)
    return b


def test_near_threshold_match_flips_per_distance_threshold():
    """Pred 1.5 m off: misses at 0.5/1.0, hits at 2.0/4.0 -> per-class mAP
    mean(0,0,1,1) = 0.5; ATE at the 2.0 threshold = 1.5 exactly."""
    gt = {"s0": [box(0, 0)]}
    pred = {"s0": [box(0, 1.5, score=0.9)]}
    aps = {th: calc_ap(accumulate(gt, pred, "car", th)) for th in DIST_THS}
    assert aps[0.5] == 0.0 and aps[1.0] == 0.0
    assert aps[2.0] == pytest.approx(1.0) and aps[4.0] == pytest.approx(1.0)
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "trans_err") == pytest.approx(1.5)


def test_duplicate_detection_counts_as_fp():
    """3 GTs; 4 preds where the 2nd (score .85) re-hits an already-taken GT.

    Devkit greedy match -> tp=[1,0,1,1], cum prec=[1, 1/2, 2/3, 3/4] at
    recalls [1/3, 1/3, 2/3, 1]. The 101-point interpolated precision (left
    clamp 1.0 below recall 1/3; duplicates anchor the right side at 0.5):
      r < 1/3          : 1.0
      1/3 < r <= 2/3   : 0.5 + (r - 1/3) * 0.5
      2/3 < r <= 1     : 2/3 + (r - 2/3) * 0.25
    AP = mean over grid r_i = 0.01*i, i=11..100 of (p - 0.1)/0.9.
    """
    gt = {"s0": [box(0, 0), box(20, 0), box(40, 0)]}
    pred = {"s0": [box(0, 0.1, score=0.9),
                   box(0, 0.2, score=0.85),      # duplicate -> FP
                   box(20, 0.1, score=0.8),
                   box(40, 0.1, score=0.7)]}
    md = accumulate(gt, pred, "car", 2.0)

    expect = 0.0
    for i in range(11, 101):
        r = 0.01 * i
        if r < 1 / 3:
            p = 1.0
        elif r <= 2 / 3:
            p = 0.5 + (r - 1 / 3) * 0.5
        else:
            p = 2 / 3 + (r - 2 / 3) * 0.25
        expect += (p - 0.1) / 0.9
    expect /= 90.0
    assert calc_ap(md) == pytest.approx(expect, abs=1e-9)


def test_attr_err_cummean_confidence_interpolation():
    """2 GTs, both matched: high-score match has the right attribute, the
    low-score one is wrong. The devkit evaluates the attr-error CUMMEAN as a
    function of confidence, then samples it at the interpolated confidence
    of each recall grid point:
      r <= 0.5 : cummean = 0   (only the first match seen)
      r in (0.5, 1] : linear 0 -> 0.5
    AAE = [sum_{i=51}^{100} (0.01 i - 0.5)] / 90 = 12.75 / 90 = 0.141666...
    """
    gt = {"s0": [box(0, 0, attr="vehicle.moving"),
                 box(20, 0, attr="vehicle.moving")]}
    pred = {"s0": [box(0, 0, score=0.9, attr="vehicle.moving"),
                   box(20, 0, score=0.5, attr="vehicle.parked")]}
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "attr_err") == pytest.approx(12.75 / 90, abs=1e-9)
    # scores flipped: wrong attribute first -> cummean starts at 1
    pred2 = {"s0": [box(0, 0, score=0.9, attr="vehicle.parked"),
                    box(20, 0, score=0.5, attr="vehicle.moving")]}
    md2 = accumulate(gt, pred2, "car", 2.0)
    # r <= 0.5: 1.0 ; r in (0.5, 1]: linear 1 -> 0.5
    expect = (40 * 1.0 + sum(1.0 - (0.01 * i - 0.5) for i in
                             range(51, 101))) / 90
    assert calc_tp(md2, "attr_err") == pytest.approx(expect, abs=1e-9)


def test_scale_and_velocity_errors_exact():
    """ASE = 1 - IoU of aligned sizes (2x2x2 vs 1x1x1 -> 1 - 1/8); AVE =
    euclidean velocity error (3,4 -> 5)."""
    gt = {"s0": [box(0, 0, vel=(0, 0))]}
    pred = {"s0": [box(0, 0, score=0.9, size=(2, 2, 2), vel=(3, 4))]}
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "scale_err") == pytest.approx(1 - 1 / 8)
    assert calc_tp(md, "vel_err") == pytest.approx(5.0)


def test_barrier_orientation_period_pi():
    """Same yaw error (pi - 0.1): cars use period 2*pi -> AOE = pi - 0.1;
    barriers use period pi -> AOE = 0.1 (devkit barrier rule)."""
    yaw = math.pi - 0.1
    gt_c = {"s0": [box(0, 0, "car")]}
    pr_c = {"s0": [box(0, 0, "car", score=0.9, yaw=yaw)]}
    md = accumulate(gt_c, pr_c, "car", 2.0)
    assert calc_tp(md, "orient_err") == pytest.approx(math.pi - 0.1)

    gt_b = {"s0": [box(0, 0, "barrier")]}
    pr_b = {"s0": [box(0, 0, "barrier", score=0.9, yaw=yaw)]}
    md = accumulate(gt_b, pr_b, "barrier", 2.0)
    assert calc_tp(md, "orient_err") == pytest.approx(0.1, abs=1e-9)


def test_class_range_filtering_drops_far_boxes():
    """Car range is 50 m from the ego: a GT at 55 m and a pred at 55 m are
    both dropped, so the remaining single TP gives AP 1.0 (not 0.5, not an
    FP penalty)."""
    ego = [0.0, 0.0, 0.0]
    gt = {"s0": [box(45, 0, ego=ego), box(55, 0, ego=ego)]}
    pred = {"s0": [box(45, 0.1, score=0.9, ego=ego),
                   box(55, 0.1, score=0.8, ego=ego)]}
    m = evaluate(gt, pred, class_names=("car",))
    assert m["label_aps"]["car"][2.0] == pytest.approx(1.0)


def test_class_exclusions_and_nds_formula():
    """Barrier excludes vel/attr, cone excludes orient/vel/attr (devkit
    LEAVES): the global TP means must skip NaNs; NDS follows
    (5*mAP + sum(1 - min(1, err))) / 10 exactly."""
    gt = {"s0": [box(0, 0, "barrier"), box(20, 0, "traffic_cone")]}
    pred = {"s0": [box(0, 0.3, "barrier", score=0.9),
                   box(20, 0.3, "traffic_cone", score=0.8)]}
    m = evaluate(gt, pred, class_names=("barrier", "traffic_cone"))
    # 0.3 m offset matches every threshold (strict <) -> mAP 1; ATE 0.3; ASE 0; AOE from
    # barrier only (0); AVE/AAE have no contributing class -> worst 1.0
    assert m["mAP"] == pytest.approx(1.0)
    te = m["tp_errors"]
    assert te["trans_err"] == pytest.approx(0.3)
    assert te["scale_err"] == pytest.approx(0.0, abs=1e-9)
    assert te["orient_err"] == pytest.approx(0.0, abs=1e-9)
    assert te["vel_err"] == 1.0 and te["attr_err"] == 1.0
    nds_expect = (5 * 1.0 + (1 - 0.3) + 1 + 1 + 0 + 0) / 10
    assert m["NDS"] == pytest.approx(nds_expect)


def test_low_recall_tp_defaults_to_one():
    """If the max recall never reaches min_recall (0.1), TP errors default
    to the worst value 1.0 (devkit calc_tp guard)."""
    gt = {"s0": [box(i * 5, 0) for i in range(11)]}
    pred = {"s0": [box(0, 0.2, score=0.9)]}       # recall 1/11 < 0.1
    md = accumulate(gt, pred, "car", 2.0)
    assert calc_tp(md, "trans_err") == 1.0
