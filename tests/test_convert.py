"""Devkit-free nuScenes converter: synthetic raw tables -> info pkl ->
dataset reader, with geometric consistency checks."""
import json
import math
import os

import numpy as np
import pytest

from toc3d_tpu.data.convert import (NuScenesTables, fill_trainval_infos,
                                    create_nuscenes_infos)
from toc3d_tpu.data.nuscenes import NuScenesInfos, quaternion_rotation_matrix


def yaw_quat(yaw):
    return [math.cos(yaw / 2), 0.0, 0.0, math.sin(yaw / 2)]


def make_raw_tables(root, n_samples=3):
    """One scene; ego drives along +x at 2 m/s; one car 10 m ahead of ego
    (static in global frame); lidar at ego origin; one forward camera."""
    v = os.path.join(root, "v1.0-synth")
    os.makedirs(v, exist_ok=True)
    dt = 500000  # 0.5 s in us
    t0 = 1_000_000_000_000_000

    sensors = [{"token": "sen_lidar", "channel": "LIDAR_TOP",
                "modality": "lidar"},
               {"token": "sen_cam", "channel": "CAM_FRONT",
                "modality": "camera"}]
    calibs = [
        {"token": "cal_lidar", "sensor_token": "sen_lidar",
         "translation": [0.0, 0.0, 1.8], "rotation": [1, 0, 0, 0],
         "camera_intrinsic": []},
        # camera: x_cam = -y_ego, y_cam = -z_ego, z_cam = x_ego (look +x)
        {"token": "cal_cam", "sensor_token": "sen_cam",
         "translation": [1.5, 0.0, 1.5],
         "rotation": [0.5, -0.5, 0.5, -0.5],
         "camera_intrinsic": [[800, 0, 800], [0, 800, 450], [0, 0, 1]]},
    ]
    scenes = [{"token": "scene0", "name": "scene-0001",
               "first_sample_token": "s0", "last_sample_token":
               f"s{n_samples-1}", "log_token": "log0",
               "nbr_samples": n_samples}]
    categories = [{"token": "cat_car", "name": "vehicle.car"}]
    instances = [{"token": "inst0", "category_token": "cat_car",
                  "nbr_annotations": n_samples,
                  "first_annotation_token": "a0",
                  "last_annotation_token": f"a{n_samples-1}"}]

    samples, sample_datas, ego_poses, anns = [], [], [], []
    for i in range(n_samples):
        ts = t0 + i * dt
        ego_x = 2.0 * 0.5 * i
        samples.append({
            "token": f"s{i}", "timestamp": ts, "scene_token": "scene0",
            "prev": f"s{i-1}" if i > 0 else "",
            "next": f"s{i+1}" if i < n_samples - 1 else "",
            "data": {"LIDAR_TOP": f"sd_l{i}", "CAM_FRONT": f"sd_c{i}"},
            "anns": [f"a{i}"],
        })
        for sd_tok, cal, fname, prev in (
                (f"sd_l{i}", "cal_lidar", f"lidar{i}.bin",
                 f"sd_l{i-1}" if i > 0 else ""),
                (f"sd_c{i}", "cal_cam", f"cam{i}.jpg", "")):
            sample_datas.append({
                "token": sd_tok, "sample_token": f"s{i}",
                "calibrated_sensor_token": cal,
                "ego_pose_token": f"ep{i}",
                "timestamp": ts, "filename": f"sweeps/{fname}",
                "prev": prev, "next": "", "is_key_frame": True,
            })
        ego_poses.append({"token": f"ep{i}", "timestamp": ts,
                          "translation": [ego_x, 0.0, 0.0],
                          "rotation": [1, 0, 0, 0]})
        anns.append({
            "token": f"a{i}", "sample_token": f"s{i}",
            "instance_token": "inst0",
            "translation": [10.0, 1.0, 0.9],       # static in global frame
            "size": [1.9, 4.5, 1.8],                # w, l, h
            "rotation": yaw_quat(0.2),
            "prev": f"a{i-1}" if i > 0 else "",
            "next": f"a{i+1}" if i < n_samples - 1 else "",
            "num_lidar_pts": 50, "num_radar_pts": 3,
            "visibility_token": "4",
        })

    tables = {
        "scene": scenes, "sample": samples, "sample_data": sample_datas,
        "ego_pose": ego_poses, "calibrated_sensor": calibs,
        "sensor": sensors, "sample_annotation": anns,
        "instance": instances, "category": categories,
        "attribute": [], "visibility": [],
    }
    for name, rows in tables.items():
        with open(os.path.join(v, f"{name}.json"), "w") as f:
            json.dump(rows, f)
    return root


def test_converter_geometry(tmp_path):
    root = make_raw_tables(str(tmp_path))
    tables = NuScenesTables(root, "v1.0-synth")
    infos = fill_trainval_infos(tables)
    assert len(infos) == 3

    info = infos[0]
    # box in lidar frame: ego at 0, lidar z=1.8 -> center (10, 1, -0.9)
    gt = info["gt_boxes"]
    np.testing.assert_allclose(gt[0, :3], [10.0, 1.0, -0.9], atol=1e-6)
    # dims stored (l, w, h)
    np.testing.assert_allclose(gt[0, 3:6], [4.5, 1.9, 1.8], atol=1e-6)
    np.testing.assert_allclose(gt[0, 6], 0.2, atol=1e-6)
    assert info["gt_names"][0] == "car"
    # static object, moving ego -> global velocity ~0
    np.testing.assert_allclose(info["gt_velocity"][0], [0, 0], atol=1e-6)
    assert info["valid_flag"][0]

    # second frame: ego moved 1 m forward -> box 1 m closer
    np.testing.assert_allclose(infos[1]["gt_boxes"][0, 0], 9.0, atol=1e-6)

    # camera extrinsics: cam2lidar translation = cam - lidar offset
    cam = info["cams"]["CAM_FRONT"]
    np.testing.assert_allclose(cam["sensor2lidar_translation"],
                               [1.5, 0.0, -0.3], atol=1e-6)

    # 2D projection: box ~8.5 m in front of the camera, slightly left
    b2 = info["bboxes2d"][0]
    assert b2.shape[0] == 1
    x1, y1, x2, y2 = b2[0]
    assert 0 <= x1 < x2 <= 1600 and 0 <= y1 < y2 <= 900
    c2 = info["centers2d"][0][0]
    assert abs(c2[0] - (800 - 800 * 1.0 / 8.5)) < 30   # u = cx + fx * (-y)/z
    assert abs(info["depths"][0][0] - 8.5) < 0.1

    # sweeps: first frame none (scene start), i.e. new-sequence marker holds
    assert len(info["sweeps"]) == 0


def test_converter_pkl_feeds_dataset(tmp_path):
    root = make_raw_tables(str(tmp_path))
    paths = create_nuscenes_infos(root, "v1.0-synth", str(tmp_path))
    assert len(paths) == 1
    infos = NuScenesInfos(paths[0])
    assert len(infos) == 3
    meta = infos.frame_meta(0)
    # lidar2global: identity rotation, translation = ego + lidar offset
    np.testing.assert_allclose(meta["ego_pose"][:3, 3], [0, 0, 1.8],
                               atol=1e-6)
    ann = infos.annotations(1)
    assert ann["gt_bboxes_3d"].shape == (1, 9)
    # bottom-z conversion applied by the reader
    np.testing.assert_allclose(ann["gt_bboxes_3d"][0, 2], -0.9 - 1.8 / 2,
                               atol=1e-5)
    assert not infos.prev_exists(0) and infos.prev_exists(1)


def test_post_process_coords_hull_vs_minmax():
    """Hull-canvas intersection (devkit post_process_coords semantics):
    a diagonal segment crossing the canvas gives a TIGHTER box than
    min/max-clip of the endpoints; fully-inside points reduce to min/max;
    a hull entirely off-canvas returns None."""
    import numpy as np
    from toc3d_tpu.data.convert import post_process_coords

    # fully inside: equals plain min/max
    pts = np.array([[10, 20], [200, 50], [120, 300], [30, 250]], float)
    out = post_process_coords(pts)
    assert out == (10.0, 20.0, 200.0, 300.0)

    # diagonal segment from (-100, 0) to (1700, 900): min/max-clip would
    # give the full canvas in y at x=0; the hull-canvas intersection enters
    # at y = 100*900/1800 = 50 and leaves at y = 1700/1800*900 = 850
    pts = np.array([[-100, 0], [1700, 900]], float)
    x1, y1, x2, y2 = post_process_coords(pts)
    assert x1 == 0.0 and x2 == 1600.0
    assert abs(y1 - 50.0) < 1e-6 and abs(y2 - 850.0) < 1e-6

    # entirely off-canvas
    assert post_process_coords(np.array([[-50, -50], [-10, -20]], float)) \
        is None

    # triangle overlapping the left edge: x clipped, ys from the clipped poly
    pts = np.array([[-100, 100], [100, 100], [100, 300]], float)
    x1, y1, x2, y2 = post_process_coords(pts)
    assert x1 == 0.0 and x2 == 100.0
    # at x=0 the hypotenuse (-100,100)->(100,300) has y=200
    assert y1 == 100.0 and abs(y2 - 300.0) < 1e-6
