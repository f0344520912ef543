"""Renderer coverage: BEV / camera / render_sample-style composite.

Parity target: reference tools/visual_nuscenes.py render_sample (the
driven entry point of the 2289-LoC forked devkit renderer,
tools/visualize.py:21-26 in the reference) — one figure tiling every
camera plus the top-down view with GT + prediction overlays.
"""
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def _dataset_and_results(tmpdir):
    from test_data_pipeline import make_synthetic_dataset
    from toc3d_tpu.data.nuscenes import quaternion_rotation_matrix

    pkl = make_synthetic_dataset(str(tmpdir))
    infos = pickle.load(open(pkl, "rb"))["infos"]
    rng = np.random.RandomState(0)
    results = {}
    for info in infos[:2]:
        e2g_r = quaternion_rotation_matrix(info["ego2global_rotation"])
        e2g_t = np.asarray(info["ego2global_translation"])
        l2e_r = quaternion_rotation_matrix(info["lidar2ego_rotation"])
        l2e_t = np.asarray(info["lidar2ego_translation"])
        annos = []
        for b, name in zip(info["gt_boxes"], info["gt_names"]):
            c = e2g_r @ (l2e_r @ b[:3] + l2e_t) + e2g_t
            yaw = float(b[6])
            annos.append(dict(
                translation=(c + rng.randn(3) * 0.2).tolist(),
                size=np.asarray(b[3:6]).tolist(),
                rotation=[np.cos(yaw / 2), 0, 0, np.sin(yaw / 2)],
                detection_name=str(name),
                detection_score=float(rng.uniform(0.4, 0.95)),
                velocity=[0.0, 0.0], attribute_name="",
                sample_token=info["token"]))
        results[info["token"]] = annos
    return infos, results


def test_renderers(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import visualize as vz
    from toc3d_tpu.runtime.nusc_metrics import build_gt_from_infos

    infos, results = _dataset_and_results(tmp_path)
    info = infos[1]
    annos = results[info["token"]]
    gt = build_gt_from_infos(infos[:2])[info["token"]]
    assert annos and gt

    bev = vz.render_bev(info, annos, gt, bev_range=30.0, size=256)
    assert bev.size == (256, 256)
    # boxes were drawn: GT green and at least one class color present
    px = np.asarray(bev).reshape(-1, 3)
    assert (px == vz.GT_COLOR).all(axis=1).any()

    cam_name = sorted(info["cams"])[0]
    cam = vz.render_camera(info, info["cams"][cam_name], annos, gt)
    assert cam.size[0] > 0

    comp = vz.render_sample_composite(info, annos, gt, bev_range=30.0,
                                      tile_w=160)
    w, h = comp.size
    n_cams = len(info["cams"])
    cols = 3 if n_cams > 2 else n_cams
    assert w > cols * 160  # cameras + BEV panel
    assert h > 22          # grid + legend strip
    arr = np.asarray(comp)
    assert arr.any()       # not all-black
    # legend strip drew the GT swatch
    assert (arr[-22:].reshape(-1, 3) == vz.GT_COLOR).all(axis=1).any()
