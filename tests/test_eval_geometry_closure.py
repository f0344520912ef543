"""Geometry closure: GT boxes in the lidar frame, formatted through the
submission path (detections_to_nusc_annos), must exactly match the global
GT built by build_gt_from_infos — perfect predictions score mAP/NDS 1.0.

This ties together: raw-table conversion, lidar->ego->global quaternion
math, (l,w,h)->(w,l,h) dim swaps, bottom-vs-gravity z, and the internal
evaluator."""
import numpy as np

from toc3d_tpu.data.nuscenes import NuScenesInfos
from toc3d_tpu.data.convert import create_nuscenes_infos
from toc3d_tpu.runtime.eval import detections_to_nusc_annos
from toc3d_tpu.runtime import nusc_metrics
from toc3d_tpu.configs.presets import CLASS_NAMES

import sys, os
sys.path.insert(0, os.path.dirname(__file__))
from test_convert import make_raw_tables  # noqa: E402


def test_perfect_predictions_close_the_loop(tmp_path):
    root = make_raw_tables(str(tmp_path))
    (path,) = create_nuscenes_infos(root, "v1.0-synth", str(tmp_path))
    infos = NuScenesInfos(path)

    results = {}
    for i in range(len(infos)):
        info = infos.infos[i]
        ann = infos.annotations(i)           # bottom-z lidar boxes (G, 9)
        boxes = ann["gt_bboxes_3d"]
        labels = ann["gt_labels_3d"]
        keep = labels >= 0
        meta = {
            "token": info["token"],
            "lidar2ego_rotation": info["lidar2ego_rotation"],
            "lidar2ego_translation": info["lidar2ego_translation"],
            "ego2global_rotation": info["ego2global_rotation"],
            "ego2global_translation": info["ego2global_translation"],
        }
        results[info["token"]] = detections_to_nusc_annos(
            boxes[keep], np.ones(keep.sum()), labels[keep], meta)
        # perfect predictions need the GT attribute; the evaluator scores
        # attr_err but AP/NDS-from-TP only needs matching names + geometry —
        # copy attributes from GT for exact closure
    gt = nusc_metrics.build_gt_from_infos(infos.infos)
    for tok in results:
        for pred in results[tok]:
            # find the matching GT (same translation) and copy its attribute
            for g in gt[tok]:
                if np.allclose(pred["translation"], g["translation"],
                               atol=1e-3):
                    pred["attribute_name"] = g["attribute_name"]

    present = sorted({a["detection_name"] for annos in gt.values()
                      for a in annos})
    m = nusc_metrics.evaluate(gt, results, class_names=present)
    assert abs(m["mAP"] - 1.0) < 1e-6, m
    assert m["tp_errors"]["trans_err"] < 1e-3, m["tp_errors"]
    assert m["tp_errors"]["scale_err"] < 1e-5, m["tp_errors"]
    assert m["tp_errors"]["orient_err"] < 1e-5, m["tp_errors"]
    assert m["tp_errors"]["vel_err"] < 1e-5, m["tp_errors"]
    assert abs(m["NDS"] - 1.0) < 1e-3, m
