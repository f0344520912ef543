#!/usr/bin/env python
"""Visualize detections: project 3D boxes from results_nusc.json onto the
camera images.

Parity target: reference tools/visualize.py + visual_nuscenes.py (a forked
devkit renderer). This devkit-free version draws projected box wireframes
with PIL per camera.

Usage:
  python tools/visualize.py --results work_dirs/eval/results_nusc.json \\
      --ann data/nuscenes/nuscenes2d_temporal_infos_val.pkl \\
      --data-root data/nuscenes --out-dir vis --num-samples 20 \\
      [--score-thresh 0.3]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np

EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 7), (7, 4),
         (0, 4), (1, 5), (2, 6), (3, 7)]
COLORS = {
    "car": (255, 158, 0), "truck": (255, 99, 71), "bus": (255, 69, 0),
    "trailer": (255, 140, 0), "construction_vehicle": (233, 150, 70),
    "pedestrian": (0, 0, 230), "motorcycle": (255, 61, 99),
    "bicycle": (220, 20, 60), "traffic_cone": (47, 79, 79),
    "barrier": (112, 128, 144),
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--results", required=True)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--out-dir", default="vis")
    ap.add_argument("--num-samples", type=int, default=20)
    ap.add_argument("--score-thresh", type=float, default=0.3)
    args = ap.parse_args()

    from PIL import Image, ImageDraw
    from toc3d_tpu.data.nuscenes import NuScenesInfos, quaternion_rotation_matrix
    from toc3d_tpu.data.convert import _box_corners

    with open(args.results) as f:
        preds = json.load(f)["results"]
    infos = NuScenesInfos(args.ann)
    os.makedirs(args.out_dir, exist_ok=True)

    for idx in range(min(args.num_samples, len(infos))):
        info = infos.infos[idx]
        annos = [a for a in preds.get(info["token"], [])
                 if a["detection_score"] >= args.score_thresh]
        for cam_name, cam in info["cams"].items():
            path = cam["data_path"]
            if args.data_root and not path.startswith("/"):
                path = os.path.join(args.data_root, path.lstrip("./"))
            img = Image.open(path).convert("RGB")
            draw = ImageDraw.Draw(img)
            intr = np.asarray(cam["cam_intrinsic"], np.float64)[:3, :3]
            # global -> cam via lidar (keys present in every pkl flavor):
            # cam2global = ego2global @ lidar2ego @ cam2lidar
            e2g_r = quaternion_rotation_matrix(info["ego2global_rotation"])
            e2g_t = np.asarray(info["ego2global_translation"])
            l2e_r = quaternion_rotation_matrix(info["lidar2ego_rotation"])
            l2e_t = np.asarray(info["lidar2ego_translation"])
            c2l_r = np.asarray(cam["sensor2lidar_rotation"], np.float64)
            c2l_t = np.asarray(cam["sensor2lidar_translation"], np.float64)
            c2g_r = e2g_r @ l2e_r @ c2l_r
            c2g_t = e2g_r @ (l2e_r @ c2l_t + l2e_t) + e2g_t
            g2c_r = c2g_r.T
            for a in annos:
                center = g2c_r @ (np.asarray(a["translation"]) - c2g_t)
                if center[2] < 0.5:
                    continue
                qg = np.asarray(a["rotation"])
                box_r = quaternion_rotation_matrix(qg)
                rot_in_cam = g2c_r @ box_r
                corners = _box_corners(center, a["size"], rot_in_cam)
                if (corners[2] < 0.1).any():
                    continue
                uv = intr @ corners
                uv = (uv[:2] / uv[2]).T
                color = COLORS.get(a["detection_name"], (0, 255, 0))
                for e0, e1 in EDGES:
                    draw.line([tuple(uv[e0]), tuple(uv[e1])], fill=color,
                              width=2)
            img.save(os.path.join(args.out_dir,
                                  f"{idx:04d}_{cam_name}.jpg"))
        if (idx + 1) % 5 == 0:
            print(f"{idx + 1} samples rendered")


if __name__ == "__main__":
    main()
