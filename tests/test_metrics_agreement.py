"""Randomized agreement: internal evaluators vs literal devkit
transcriptions (VERDICT r2 #5).

runtime/nusc_metrics.evaluate must agree with
tests/devkit_detection_transcription.evaluate (an independent, slow,
deliberately literal restatement of the devkit algorithm) to 1e-9 on
mAP/NDS/per-class APs/TP errors over randomized scenarios covering
duplicate scores, empty frames, out-of-range boxes, attribute-less GT,
classes with zero GT, and zero-match classes.
"""
import math
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

from toc3d_tpu.runtime import nusc_metrics as internal
import devkit_detection_transcription as devkit

CLASSES = list(devkit.CLASS_RANGE)
ATTRS = ["", "vehicle.moving", "vehicle.parked", "pedestrian.moving"]


def yaw_quat(yaw):
    return [math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)]


def random_box(rng, name, ego, score=None):
    # mostly in range, some beyond the class range (filter coverage)
    r = rng.uniform(0, devkit.CLASS_RANGE[name] * 1.3)
    th = rng.uniform(0, 2 * np.pi)
    box = {
        "translation": [ego[0] + r * math.cos(th), ego[1] + r * math.sin(th),
                        rng.uniform(-2, 2)],
        "size": rng.uniform(0.3, 6.0, 3).tolist(),
        "rotation": yaw_quat(rng.uniform(-np.pi, np.pi)),
        "velocity": rng.uniform(-8, 8, 2).tolist(),
        "detection_name": name,
        "attribute_name": ATTRS[rng.randint(len(ATTRS))],
        "ego_translation": list(ego),
    }
    if score is not None:
        box["detection_score"] = score
    return box


def random_scenario(seed):
    rng = np.random.RandomState(seed)
    n_samples = rng.randint(2, 8)
    gt_all, pred_all = {}, {}
    # a small score pool forces plenty of exact duplicates (tie ordering)
    score_pool = np.round(rng.uniform(0, 1, 7), 2)
    for s in range(n_samples):
        tok = f"sample_{s}"
        ego = rng.uniform(-30, 30, 2)
        gts, preds = [], []
        if rng.rand() > 0.15:  # some empty-GT frames
            for _ in range(rng.randint(0, 12)):
                gts.append(random_box(rng, CLASSES[rng.randint(8)], ego))
        if rng.rand() > 0.15:  # some empty-pred frames
            for _ in range(rng.randint(0, 18)):
                name = CLASSES[rng.randint(len(CLASSES))]
                score = float(score_pool[rng.randint(len(score_pool))])
                p = random_box(rng, name, ego, score)
                if gts and rng.rand() < 0.6:
                    # perturb a GT so matches at the various dist_ths occur
                    g = gts[rng.randint(len(gts))]
                    p["translation"] = [
                        g["translation"][0] + rng.uniform(-3, 3),
                        g["translation"][1] + rng.uniform(-3, 3),
                        g["translation"][2]]
                    if rng.rand() < 0.7:
                        p["detection_name"] = g["detection_name"]
                    if rng.rand() < 0.5:
                        p["attribute_name"] = g["attribute_name"]
                preds.append(p)
        gt_all[tok] = gts
        pred_all[tok] = preds
    return gt_all, pred_all


@pytest.mark.parametrize("seed", range(50))
def test_detection_metrics_agree(seed):
    gt_all, pred_all = random_scenario(seed)
    ours = internal.evaluate(gt_all, pred_all)
    ref = devkit.evaluate(gt_all, pred_all)
    assert ours["mAP"] == pytest.approx(ref["mAP"], abs=1e-9)
    assert ours["NDS"] == pytest.approx(ref["NDS"], abs=1e-9)
    for cls in CLASSES:
        for th in devkit.DIST_THS:
            assert ours["label_aps"][cls][th] == pytest.approx(
                ref["label_aps"][cls][th], abs=1e-9), (cls, th)
    for m in devkit.TP_METRICS:
        assert ours["tp_errors"][m] == pytest.approx(
            ref["tp_errors"][m], abs=1e-9), m
