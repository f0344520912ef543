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


# ---------------------------------------------------------------------------
# tracking (AMOTA/AMOTP) agreement
# ---------------------------------------------------------------------------

from toc3d_tpu.tracking import metrics as internal_tracking  # noqa: E402
import devkit_tracking_transcription as devkit_tracking  # noqa: E402

TRACK_CLASSES = list(devkit_tracking.TRACKING_NAMES)


def random_tracking_scenario(seed):
    rng = np.random.RandomState(seed + 10_000)
    n_scenes = rng.randint(1, 4)
    scenes, gt_frames, pred_frames = [], {}, {}
    score_pool = np.round(rng.uniform(0, 1, 6), 2)
    for s in range(n_scenes):
        n_frames = rng.randint(3, 9)
        toks = [f"s{s}_f{t}" for t in range(n_frames)]
        scenes.append(toks)
        ego = rng.uniform(-20, 20, 2)
        # GT tracks: random walks, intermittent visibility (gap coverage
        # exercises the persistent-correspondence stickiness)
        tracks = []
        for k in range(rng.randint(1, 7)):
            cls = TRACK_CLASSES[rng.randint(len(TRACK_CLASSES))]
            pos = rng.uniform(-30, 30, 2) + ego
            vis = rng.rand(n_frames) > 0.25
            tracks.append((f"gt{s}_{k}", cls, pos, vis))
        # pred tracks: follow a GT with noise + occasional id switches,
        # plus pure false positives
        preds = []
        for k, (gid, cls, pos, vis) in enumerate(tracks):
            if rng.rand() < 0.15:
                continue  # fully-missed track
            n_segments = 1 + (rng.rand() < 0.3)
            preds.append((f"hyp{s}_{k}", cls, k, n_segments))
        n_fp_tracks = rng.randint(0, 3)
        for t, tok in enumerate(toks):
            gts, hyps = [], []
            for gid, cls, pos, vis in tracks:
                pos = pos + rng.uniform(-1, 1, 2)
                if vis[t]:
                    gts.append({"tracking_id": gid, "tracking_name": cls,
                                "translation": [pos[0], pos[1], 0.0],
                                "ego_translation": list(ego)})
            for hid, cls, k, n_seg in preds:
                gid, _, pos, vis = tracks[k]
                if rng.rand() < 0.2:
                    continue  # dropout frame
                seg = 0 if t < len(toks) // 2 else n_seg - 1
                noisy = pos + rng.uniform(-2.5, 2.5, 2)
                hyps.append({
                    "tracking_id": f"{hid}_seg{seg}",
                    "tracking_name": cls,
                    "translation": [noisy[0], noisy[1], 0.0],
                    "tracking_score":
                        float(score_pool[rng.randint(len(score_pool))]),
                    "ego_translation": list(ego)})
            for k in range(n_fp_tracks):
                if rng.rand() < 0.5:
                    p = ego + rng.uniform(-35, 35, 2)
                    hyps.append({
                        "tracking_id": f"fp{s}_{k}",
                        "tracking_name":
                            TRACK_CLASSES[rng.randint(len(TRACK_CLASSES))],
                        "translation": [p[0], p[1], 0.0],
                        "tracking_score":
                            float(score_pool[rng.randint(len(score_pool))]),
                        "ego_translation": list(ego)})
            gt_frames[tok] = gts
            pred_frames[tok] = hyps
    return gt_frames, pred_frames, scenes


@pytest.mark.parametrize("seed", range(50))
def test_tracking_metrics_agree(seed):
    gt_frames, pred_frames, scenes = random_tracking_scenario(seed)
    ours = internal_tracking.evaluate_tracking(gt_frames, pred_frames, scenes)
    ref = devkit_tracking.evaluate_tracking(gt_frames, pred_frames, scenes)
    assert ours["AMOTA"] == pytest.approx(ref["AMOTA"], abs=1e-9)
    assert ours["AMOTP"] == pytest.approx(ref["AMOTP"], abs=1e-9)
    assert set(ours["per_class"]) == set(ref["per_class"])
    for cls, v in ref["per_class"].items():
        assert ours["per_class"][cls]["amota"] == pytest.approx(
            v["amota"], abs=1e-9), cls
        assert ours["per_class"][cls]["amotp"] == pytest.approx(
            v["amotp"], abs=1e-9), cls
