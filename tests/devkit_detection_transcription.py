"""Deliberately LITERAL transcription of the nuscenes-devkit detection
evaluation (nuscenes/eval/detection/algo.py accumulate/calc_ap/calc_tp and
evaluate.py aggregation, config detection_cvpr_2019) for randomized
agreement testing against toc3d_tpu.runtime.nusc_metrics (VERDICT r2 #5).

Slow python loops on purpose; shares NO code with the production module.
The devkit semantics transcribed here (v1.1.x):
  * predictions sorted by (score, flat_index) ascending then reversed —
    ties order by HIGHER index first;
  * greedy match per prediction over not-yet-taken same-class GTs of its
    sample by center distance;
  * zero matches -> "no_predictions" MetricData (precision 0, conf 0,
    errors 1);
  * cummean is NaN-aware (nancumsum / count of non-nan, 0 where count 0);
    attribute error is NaN when the GT has no attribute;
  * max_recall_ind = last index with NONZERO interpolated confidence;
  * calc_ap clips precision below min_precision after dropping
    recall <= min_recall; calc_tp averages [first_ind, max_recall_ind];
  * class TP exclusions fixed to NaN; tp_errors nanmean over classes;
  * NDS = (5*mAP + sum max(0, 1-err)) / 10.
"""
import math

import numpy as np

DIST_THS = (0.5, 1.0, 2.0, 4.0)
DIST_TH_TP = 2.0
MIN_RECALL = 0.1
MIN_PRECISION = 0.1
NELEM = 101
CLASS_RANGE = {
    "car": 50, "truck": 50, "bus": 50, "trailer": 50,
    "construction_vehicle": 50, "pedestrian": 40, "motorcycle": 40,
    "bicycle": 40, "traffic_cone": 30, "barrier": 30,
}
TP_METRICS = ("trans_err", "scale_err", "orient_err", "vel_err", "attr_err")


def center_distance(gt, pred):
    return np.linalg.norm(np.array(pred["translation"][:2])
                          - np.array(gt["translation"][:2]))


def scale_iou(gt, pred):
    sa = np.maximum(np.array(gt["size"], float), 1e-9)
    sb = np.maximum(np.array(pred["size"], float), 1e-9)
    inter = float(np.prod(np.minimum(sa, sb)))
    union = float(np.prod(sa)) + float(np.prod(sb)) - inter
    return inter / union


def quaternion_yaw(q):
    w, x, y, z = q
    return math.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))


def yaw_diff(gt, pred, period):
    yaw_gt = quaternion_yaw(gt["rotation"])
    yaw_est = quaternion_yaw(pred["rotation"])
    return abs(angle_diff(yaw_gt, yaw_est, period))


def angle_diff(x, y, period):
    diff = (x - y + period / 2) % period - period / 2
    if diff > np.pi:
        diff = diff - (2 * np.pi)
    return diff


def velocity_l2(gt, pred):
    return np.linalg.norm(np.array(pred["velocity"])
                          - np.array(gt["velocity"]))


def attr_acc(gt, pred):
    """devkit: NaN when the GT has no attribute assigned."""
    if gt.get("attribute_name", "") == "":
        return np.nan
    return float(gt["attribute_name"] == pred.get("attribute_name", ""))


def cummean(x):
    x = np.array(x, float)
    if sum(np.logical_not(np.isnan(x))) == 0:
        return np.ones(len(x))
    sum_vals = np.nancumsum(x)
    count_vals = np.cumsum(~np.isnan(x))
    return np.divide(sum_vals, count_vals, out=np.zeros_like(sum_vals),
                     where=count_vals != 0)


def no_predictions():
    return {
        "recall": np.linspace(0, 1, NELEM),
        "precision": np.zeros(NELEM),
        "confidence": np.zeros(NELEM),
        **{k: np.ones(NELEM) for k in TP_METRICS},
    }


def max_recall_ind(md):
    non_zero = np.nonzero(md["confidence"])[0]
    return 0 if len(non_zero) == 0 else int(non_zero[-1])


def accumulate(gt_all, pred_all, class_name, dist_th):
    """gt_all/pred_all: {sample_token: [box dict, ...]} (already filtered)."""
    npos = len([1 for boxes in gt_all.values() for b in boxes
                if b["detection_name"] == class_name])
    if npos == 0:
        return None  # caller treats as no_predictions + ap 0

    # EvalBoxes.all order: iterate samples in dict order, boxes in order
    pred_boxes_list = [(tok, b) for tok, boxes in pred_all.items()
                       for b in boxes if b["detection_name"] == class_name]
    pred_confs = [b["detection_score"] for _, b in pred_boxes_list]
    # devkit tie rule: sorted (value, index) ascending, then reversed
    sortind = [i for (v, i) in sorted(
        (v, i) for (i, v) in enumerate(pred_confs))][::-1]

    tp, fp, conf = [], [], []
    match_data = {k: [] for k in TP_METRICS}
    match_data["conf"] = []
    taken = set()
    for ind in sortind:
        tok, pred_box = pred_boxes_list[ind]
        min_dist = np.inf
        match_gt_idx = None
        for gt_idx, gt_box in enumerate(gt_all.get(tok, [])):
            if (gt_box["detection_name"] == class_name
                    and (tok, gt_idx) not in taken):
                this_distance = center_distance(gt_box, pred_box)
                if this_distance < min_dist:
                    min_dist = this_distance
                    match_gt_idx = gt_idx
        is_match = min_dist < dist_th
        if is_match:
            taken.add((tok, match_gt_idx))
            tp.append(1)
            fp.append(0)
            conf.append(pred_box["detection_score"])
            gt_box_match = gt_all[tok][match_gt_idx]
            match_data["trans_err"].append(
                center_distance(gt_box_match, pred_box))
            match_data["vel_err"].append(
                velocity_l2(gt_box_match, pred_box))
            match_data["scale_err"].append(
                1 - scale_iou(gt_box_match, pred_box))
            period = np.pi if class_name == "barrier" else 2 * np.pi
            match_data["orient_err"].append(
                yaw_diff(gt_box_match, pred_box, period=period))
            match_data["attr_err"].append(
                1 - attr_acc(gt_box_match, pred_box))
            match_data["conf"].append(pred_box["detection_score"])
        else:
            tp.append(0)
            fp.append(1)
            conf.append(pred_box["detection_score"])

    if len(match_data["trans_err"]) == 0:
        return no_predictions()

    tp = np.cumsum(tp).astype(float)
    fp = np.cumsum(fp).astype(float)
    conf = np.array(conf)
    prec = tp / (fp + tp)
    rec = tp / float(npos)
    rec_interp = np.linspace(0, 1, NELEM)
    prec = np.interp(rec_interp, rec, prec, right=0)
    conf_i = np.interp(rec_interp, rec, conf, right=0)

    out = {"recall": rec_interp, "precision": prec, "confidence": conf_i}
    for key in TP_METRICS:
        tmp = cummean(np.array(match_data[key]))
        out[key] = np.interp(conf_i[::-1],
                             np.array(match_data["conf"])[::-1],
                             tmp[::-1])[::-1]
    return out


def calc_ap(md, min_recall=MIN_RECALL, min_precision=MIN_PRECISION):
    if md is None:
        return 0.0
    prec = np.copy(md["precision"])
    prec = prec[round(100 * min_recall) + 1:]
    prec -= min_precision
    prec[prec < 0] = 0
    return float(np.mean(prec)) / (1.0 - min_precision)


def calc_tp(md, metric_name, min_recall=MIN_RECALL):
    if md is None:
        md = no_predictions()
    first_ind = round(100 * min_recall) + 1
    last_ind = max_recall_ind(md)
    if last_ind < first_ind:
        return 1.0
    return float(np.mean(md[metric_name][first_ind:last_ind + 1]))


def filter_boxes(boxes_all, class_range=CLASS_RANGE):
    out = {}
    for tok, boxes in boxes_all.items():
        kept = []
        for b in boxes:
            name = b["detection_name"]
            if name not in class_range:
                continue
            ego = b.get("ego_translation")
            if ego is not None:
                d = math.hypot(b["translation"][0] - ego[0],
                               b["translation"][1] - ego[1])
                if d > class_range[name]:
                    continue
            kept.append(b)
        out[tok] = kept
    return out


def evaluate(gt_all, pred_all, class_names=tuple(CLASS_RANGE)):
    gt_all = filter_boxes(gt_all)
    pred_all = filter_boxes(pred_all)

    label_aps = {}
    label_tp = {}
    for class_name in class_names:
        mds = {th: accumulate(gt_all, pred_all, class_name, th)
               for th in DIST_THS}
        label_aps[class_name] = {th: calc_ap(mds[th]) for th in DIST_THS}
        label_tp[class_name] = {}
        for metric_name in TP_METRICS:
            if class_name == "traffic_cone" and metric_name in (
                    "attr_err", "vel_err", "orient_err"):
                v = np.nan
            elif class_name == "barrier" and metric_name in (
                    "attr_err", "vel_err"):
                v = np.nan
            else:
                v = calc_tp(mds[DIST_TH_TP], metric_name)
            label_tp[class_name][metric_name] = v

    mean_dist_aps = {cls: float(np.mean(list(label_aps[cls].values())))
                     for cls in class_names}
    mean_ap = float(np.mean(list(mean_dist_aps.values())))
    tp_errors = {m: float(np.nanmean([label_tp[c][m] for c in class_names]))
                 for m in TP_METRICS}
    tp_scores = {m: max(0.0, 1.0 - tp_errors[m]) for m in TP_METRICS}
    nds = (5.0 * mean_ap + sum(tp_scores.values())) / 10.0
    return {"mAP": mean_ap, "NDS": nds, "label_aps": label_aps,
            "tp_errors": tp_errors}
