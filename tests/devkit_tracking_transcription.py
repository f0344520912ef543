"""Deliberately LITERAL transcription of the nuscenes-devkit tracking
evaluation (nuscenes/eval/tracking/algo.py TrackingEvaluation + the
motmetrics MOTAccumulator bookkeeping it builds on, config
tracking_nips_2019) for randomized agreement testing against
toc3d_tpu.tracking.metrics (VERDICT r2 #5).

Slow loops on purpose; shares NO code with the production module.
Transcribed semantics:
  * motmetrics matching per frame: (1) re-establish each GT's LAST KNOWN
    correspondence (persistent across gaps, not just the previous frame)
    when the hypothesis is present and within dist_th — always a MATCH;
    (2) Hungarian (scipy) on the remaining feasible pairs; a pair whose
    hyp differs from the GT's last known correspondence is a SWITCH;
  * per class: one accumulator per scene, counters summed over scenes;
  * unthresholded pass collects scores of MATCH+SWITCH events;
    compute_thresholds: rec = (1..n)/gt_count over scores sorted desc,
    thresholds = np.interp(rec_interp, rec, scores) with NaN where
    rec_interp > max recall achieved (rec_interp = linspace(0.1, 1, 40)
    rounded to 12 decimals);
  * per threshold: recall = num_detections/num_objects (MATCH+SWITCH),
    MOTAR = max(0, 1 - (IDS + FP + FN - (1-recall)*num_objects) /
    (recall*num_objects)); MOTP = dist sum / num_detections;
  * NaN thresholds take the worst values (MOTAR 0, MOTP 2.0 per the
    tracking_nips_2019 metric_worst table); AMOTA/AMOTP = mean over the
    40 recall levels; class-level mean over classes with GT.
"""
import math

import numpy as np

TRACKING_NAMES = ("bicycle", "bus", "car", "motorcycle", "pedestrian",
                  "trailer", "truck")
DIST_TH_TP = 2.0
NUM_THRESHOLDS = 40
MIN_RECALL = 0.1
CLASS_RANGE = {"car": 50, "truck": 50, "bus": 50, "trailer": 50,
               "pedestrian": 40, "motorcycle": 40, "bicycle": 40}
MOTAR_WORST = 0.0
MOTP_WORST = 2.0


def filter_range(frames):
    out = {}
    for tok, boxes in frames.items():
        kept = []
        for b in boxes:
            name = b["tracking_name"]
            if name not in CLASS_RANGE:
                continue
            ego = b.get("ego_translation")
            if ego is not None:
                d = math.hypot(b["translation"][0] - ego[0],
                               b["translation"][1] - ego[1])
                if d > CLASS_RANGE[name]:
                    continue
            kept.append(b)
        out[tok] = kept
    return out


class MotmetricsAccumulator:
    """motmetrics.MOTAccumulator semantics (events we need only)."""

    def __init__(self):
        self.m = {}  # last known gt_id -> hyp_id (persistent)
        self.events = []  # (type, dist, hyp_score)

    def update(self, gt_boxes, hyp_boxes):
        oids = [g["tracking_id"] for g in gt_boxes]
        hids = [h["tracking_id"] for h in hyp_boxes]
        no, nh = len(oids), len(hids)
        dists = np.full((no, nh), np.nan)
        for i, g in enumerate(gt_boxes):
            for j, h in enumerate(hyp_boxes):
                d = math.hypot(g["translation"][0] - h["translation"][0],
                               g["translation"][1] - h["translation"][1])
                if d < DIST_TH_TP:
                    dists[i, j] = d

        oids_masked = np.zeros(no, bool)
        hids_masked = np.zeros(nh, bool)
        if no * nh > 0:
            # 1. re-establish previous correspondences (always MATCH)
            for i in range(no):
                if oids[i] not in self.m:
                    continue
                hprev = self.m[oids[i]]
                js = [j for j in range(nh)
                      if not hids_masked[j] and hids[j] == hprev]
                if not js:
                    continue
                j = js[0]
                if np.isfinite(dists[i, j]):
                    oids_masked[i] = True
                    hids_masked[j] = True
                    self.m[oids[i]] = hids[j]
                    self.events.append(
                        ("MATCH", dists[i, j],
                         hyp_boxes[j].get("tracking_score", 0.0)))
            # 2. Hungarian on the remainder
            d2 = dists.copy()
            d2[oids_masked, :] = np.nan
            d2[:, hids_masked] = np.nan
            from scipy.optimize import linear_sum_assignment
            big = 1e18
            cost = np.where(np.isfinite(d2), d2, big)
            rids, cids = linear_sum_assignment(cost)
            for i, j in zip(rids, cids):
                if not np.isfinite(d2[i, j]):
                    continue
                o, h = oids[i], hids[j]
                is_switch = o in self.m and self.m[o] != h
                self.events.append(
                    ("SWITCH" if is_switch else "MATCH", d2[i, j],
                     hyp_boxes[j].get("tracking_score", 0.0)))
                self.m[o] = h
                oids_masked[i] = True
                hids_masked[j] = True

        for i in range(no):
            if not oids_masked[i]:
                self.events.append(("MISS", np.nan, np.nan))
        for j in range(nh):
            if not hids_masked[j]:
                self.events.append(("FP", np.nan, np.nan))
        self.n_gt = getattr(self, "n_gt", 0) + no


def accumulate_class(gt_frames, pred_frames, scenes, cls, threshold):
    counters = dict(num_matches=0, num_switches=0, num_misses=0,
                    num_false_positives=0, num_objects=0, dist_sum=0.0,
                    scores=[])
    for scene_tokens in scenes:
        acc = MotmetricsAccumulator()
        for tok in scene_tokens:
            gts = [g for g in gt_frames.get(tok, [])
                   if g["tracking_name"] == cls]
            hyps = [h for h in pred_frames.get(tok, [])
                    if h["tracking_name"] == cls
                    and (threshold is None
                         or h.get("tracking_score", 0.0) >= threshold)]
            acc.update(gts, hyps)
        for typ, dist, score in acc.events:
            if typ == "MATCH":
                counters["num_matches"] += 1
                counters["dist_sum"] += dist
                counters["scores"].append(score)
            elif typ == "SWITCH":
                counters["num_switches"] += 1
                counters["dist_sum"] += dist
                counters["scores"].append(score)
            elif typ == "MISS":
                counters["num_misses"] += 1
            elif typ == "FP":
                counters["num_false_positives"] += 1
        counters["num_objects"] += getattr(acc, "n_gt", 0)
    return counters


def compute_thresholds(scores, gt_box_count):
    scores = np.array(sorted(scores))[::-1]
    if len(scores) == 0 or gt_box_count == 0:
        rec_interp = np.linspace(MIN_RECALL, 1, NUM_THRESHOLDS).round(12)
        return np.full(NUM_THRESHOLDS, np.nan), rec_interp
    rec = np.arange(1, len(scores) + 1) / gt_box_count
    max_recall_achieved = np.max(rec)
    rec_interp = np.linspace(MIN_RECALL, 1, NUM_THRESHOLDS).round(12)
    thresholds = np.interp(rec_interp, rec, scores, right=0)
    thresholds[rec_interp > max_recall_achieved] = np.nan
    return thresholds, rec_interp


def evaluate_tracking(gt_frames, pred_frames, scenes,
                      class_names=TRACKING_NAMES):
    gt_frames = filter_range(gt_frames)
    pred_frames = filter_range(pred_frames)

    per_class = {}
    for cls in class_names:
        gt_count = sum(1 for boxes in gt_frames.values()
                       for b in boxes if b["tracking_name"] == cls)
        if gt_count == 0:
            continue
        first = accumulate_class(gt_frames, pred_frames, scenes, cls, None)
        thresholds, _ = compute_thresholds(first["scores"], gt_count)
        motars, motps = [], []
        for th in thresholds:
            if np.isnan(th):
                motars.append(MOTAR_WORST)
                motps.append(MOTP_WORST)
                continue
            c = accumulate_class(gt_frames, pred_frames, scenes, cls, th)
            num_det = c["num_matches"] + c["num_switches"]
            num_obj = c["num_objects"]
            recall = num_det / num_obj if num_obj else 0.0
            denominator = recall * num_obj
            if denominator == 0.0:
                motars.append(MOTAR_WORST)
                motps.append(MOTP_WORST)
                continue
            nominator = (c["num_misses"] + c["num_switches"]
                         + c["num_false_positives"]) - (1 - recall) * num_obj
            motars.append(float(np.maximum(0.0, 1.0 - nominator / denominator)))
            motps.append(c["dist_sum"] / num_det if num_det else MOTP_WORST)
        per_class[cls] = {"amota": float(np.mean(motars)),
                          "amotp": float(np.mean(motps)),
                          "motar": motars, "motp": motps,
                          "num_gt": gt_count}

    if per_class:
        amota = float(np.mean([v["amota"] for v in per_class.values()]))
        amotp = float(np.mean([v["amotp"] for v in per_class.values()]))
    else:
        amota, amotp = 0.0, MOTP_WORST
    return {"AMOTA": amota, "AMOTP": amotp, "per_class": per_class}
