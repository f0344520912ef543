"""Integration tests: synthetic info pkl -> eval/train frame building ->
streaming inference -> submission -> internal metrics; plus sampler
semantics."""
import json
import os
import pickle

import numpy as np
import pytest
import jax

from toc3d_tpu.data.nuscenes import NuScenesInfos, AugConfig
from toc3d_tpu.data.loader import build_eval_frame, build_train_sample
from toc3d_tpu.data.sampler import (InfiniteGroupEachSampleInBatchSampler,
                                    contiguous_eval_chunks)

TINY_AUG = AugConfig(resize_lim=(0.7, 0.9), final_dim=(64, 128),
                     H=90, W=160, rand_flip=True)


def make_synthetic_dataset(tmpdir, n_scenes=2, frames_per_scene=3,
                           n_cams=2):
    from PIL import Image

    rng = np.random.RandomState(0)
    infos = []
    t = 1_600_000_000_000_000  # microseconds
    img_dir = os.path.join(tmpdir, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    for s in range(n_scenes):
        for f in range(frames_per_scene):
            cams = {}
            for c in range(n_cams):
                path = os.path.join(img_dir, f"s{s}_f{f}_c{c}.jpg")
                Image.fromarray(rng.randint(0, 255, (90, 160, 3),
                                            np.uint8)).save(path)
                intr = np.eye(3)
                intr[0, 0] = intr[1, 1] = 120.0
                intr[0, 2], intr[1, 2] = 80.0, 45.0
                cams[f"CAM{c}"] = {
                    "data_path": path,
                    "cam_intrinsic": intr,
                    "sensor2lidar_rotation": np.eye(3),
                    "sensor2lidar_translation": np.zeros(3),
                    "timestamp": t,
                }
            n_gt = 3
            boxes = rng.randn(n_gt, 7).astype(np.float64)
            boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 1.0
            infos.append({
                "cams": cams,
                "token": f"s{s}f{f}",
                "scene_token": f"scene{s}",
                "timestamp": t,
                "prev": "", "next": "",
                "frame_idx": f,
                "lidar_path": "none.bin",
                "sweeps": [] if f == 0 else [{"fake": 1}],
                "ego2global_rotation": [1, 0, 0, 0],
                "ego2global_translation": [10.0 * s, 1.0 * f, 0.0],
                "lidar2ego_rotation": [1, 0, 0, 0],
                "lidar2ego_translation": [0.0, 0.0, 1.5],
                "gt_boxes": boxes,
                "gt_velocity": rng.randn(n_gt, 2),
                "gt_names": np.array(["car", "pedestrian", "bus"]),
                "valid_flag": np.ones(n_gt, bool),
                "num_lidar_pts": np.full(n_gt, 10),
                "bboxes2d": [rng.rand(2, 4) * 50 for _ in range(n_cams)],
                "labels2d": [np.array([0, 1]) for _ in range(n_cams)],
                "centers2d": [rng.rand(2, 2) * 50 for _ in range(n_cams)],
                "depths": [rng.rand(2) * 30 for _ in range(n_cams)],
                "bboxes_ignore": [np.zeros((0, 4)) for _ in range(n_cams)],
            })
            t += 500_000
    # fix 2D boxes to be valid xyxy
    for info in infos:
        info["bboxes2d"] = [np.sort(b.reshape(-1, 2, 2), axis=1)
                            .reshape(-1, 4) * [1, 1, 2, 2] for b in
                            info["bboxes2d"]]
    path = os.path.join(tmpdir, "infos.pkl")
    with open(path, "wb") as f:
        pickle.dump({"infos": infos,
                     "metadata": {"version": "v1.0-test-synthetic"}}, f)
    return path


def test_infos_and_sequence_flags(tmp_path):
    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    assert len(infos) == 6
    np.testing.assert_array_equal(infos.flag, [0, 0, 0, 1, 1, 1])
    assert not infos.prev_exists(0) and infos.prev_exists(1)
    assert not infos.prev_exists(3)
    # seq_split_num=3 -> every frame its own group
    infos3 = NuScenesInfos(path, seq_split_num=3)
    assert len(np.bincount(infos3.flag)) == 6


def test_eval_frame_shapes(tmp_path):
    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    frame, meta = build_eval_frame(infos, 0, TINY_AUG)
    assert frame["img"].shape == (1, 2, 64, 128, 3)
    assert frame["intrinsics"].shape == (1, 2, 4, 4)
    assert np.isfinite(frame["img"]).all()
    # img2lidar must invert lidar2img
    prod = frame["img2lidar"][0, 0] @ frame["lidar2img"][0, 0]
    np.testing.assert_allclose(prod, np.eye(4), atol=1e-3)
    assert meta["token"] == infos.infos[0]["token"]


def test_eval_frame_fast_decode(tmp_path):
    """Draft-mode JPEG decode: same shapes/geometry, pixels close to the
    exact path (JPEG + drafted-scale bilinear both perturb values; the
    normalized-image agreement bound is loose but catches layout or
    BGR-order regressions)."""
    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    exact, _ = build_eval_frame(infos, 0, TINY_AUG)
    fast, meta = build_eval_frame(infos, 0, TINY_AUG, fast_decode=True)
    assert fast["img"].shape == exact["img"].shape
    np.testing.assert_array_equal(fast["intrinsics"], exact["intrinsics"])
    # random-noise JPEGs are the adversarial case for resampling diffs;
    # mean abs diff of normalized pixels must stay small and correlated
    d = np.abs(fast["img"] - exact["img"]).mean()
    assert d < 0.5, d
    c = np.corrcoef(fast["img"].ravel(), exact["img"].ravel())[0, 1]
    assert c > 0.9, c
    assert meta["token"] == infos.infos[0]["token"]


def test_device_normalize_parity(tmp_path):
    """uint8 frames (device_normalize) must produce the same detections as
    host-normalized f32 frames. Equivalent math — XLA may rewrite the
    in-graph divide as multiply-by-reciprocal when fusing, so agreement is
    to ~1e-5, not bitwise."""
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.data.nuscenes import normalize_image
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           make_infer_fn)

    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    f_u8, _ = build_eval_frame(infos, 0, TINY_AUG, fast_decode=True,
                               device_normalize=True)
    assert f_u8["img"].dtype == np.uint8
    f_f32 = dict(f_u8)
    f_f32["img"] = normalize_image(f_u8["img"].astype(np.float32))

    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    infer = make_infer_fn(cfg)
    _, d_u8 = infer(params, init_state(1, cfg), f_u8)
    _, d_f32 = infer(params, init_state(1, cfg), f_f32)
    for name, a, b in zip(d_u8._fields, d_u8, d_f32):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b, np.float32),
                                   rtol=1e-4, atol=1e-4, err_msg=name)

    with pytest.raises(ValueError, match="fast_decode"):
        build_eval_frame(infos, 0, TINY_AUG, device_normalize=True)


def test_train_sample_shapes(tmp_path):
    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path, seq_split_num=1)
    rng = np.random.RandomState(1)
    s = build_train_sample(infos, 1, TINY_AUG, rng, max_gt_3d=8, max_gt_2d=8)
    assert s["img"].shape == (2, 64, 128, 3)
    assert s["gt_bboxes_3d"].shape == (8, 9)
    assert s["gt_valid_3d"].dtype == bool
    assert s["prev_exists"] == 1.0
    assert np.isfinite(s["img"]).all()
    # gravity-z conversion happened for valid boxes
    if s["gt_valid_3d"].any():
        assert np.isfinite(s["gt_bboxes_3d"][s["gt_valid_3d"]]).all()


def test_streaming_eval_to_metrics(tmp_path):
    """Full loop: synthetic infos -> tiny detector streaming -> submission
    json -> internal evaluator."""
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           make_infer_fn)
    from toc3d_tpu.runtime.eval import (detections_to_nusc_annos,
                                        write_submission)
    from toc3d_tpu.runtime import nusc_metrics

    path = make_synthetic_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    infer = make_infer_fn(cfg)
    state = init_state(1, cfg)
    results = {}
    prev_scene = None
    for i in range(len(infos)):
        frame, meta = build_eval_frame(infos, i, TINY_AUG)
        frame["prev_exists"][:] = float(meta["scene_token"] == prev_scene)
        prev_scene = meta["scene_token"]
        state, det = infer(params, state, frame)
        valid = np.asarray(det.valid[0])
        results[meta["token"]] = detections_to_nusc_annos(
            np.asarray(det.bboxes[0])[valid],
            np.asarray(det.scores[0])[valid],
            np.asarray(det.labels[0])[valid], meta)
    sub_path = write_submission(results, str(tmp_path / "out"))
    with open(sub_path) as f:
        sub = json.load(f)
    assert set(sub["results"]) == {i["token"] for i in infos.infos}
    anno = next(a for annos in sub["results"].values() for a in annos)
    assert set(anno) >= {"sample_token", "translation", "size", "rotation",
                         "velocity", "detection_name", "detection_score",
                         "attribute_name"}
    gt = nusc_metrics.build_gt_from_infos(infos.infos)
    m = nusc_metrics.evaluate(gt, sub["results"])
    assert 0.0 <= m["mAP"] <= 1.0 and 0.0 <= m["NDS"] <= 1.0


def test_streaming_sampler_lanes_stay_in_scene():
    flags = np.array([0] * 5 + [1] * 4 + [2] * 6 + [3] * 3)
    s = InfiniteGroupEachSampleInBatchSampler(flags, batch_size=2, seed=0)
    it = iter(s)
    batches = [next(it) for _ in range(12)]
    lanes = list(zip(*batches))
    for lane in lanes:
        # each lane visits groups contiguously and in order within a group
        groups = [flags[i] for i in lane]
        seen = []
        for i, g in zip(lane, groups):
            if not seen or seen[-1][0] != g:
                seen.append((g, [i]))
            else:
                seen[-1][1].append(i)
        for g, idxs in seen:
            expected = np.where(flags == g)[0][: len(idxs)].tolist()
            assert idxs == expected, (g, idxs, expected)
    # the two lanes start on different groups
    assert flags[lanes[0][0]] != flags[lanes[1][0]]


def test_contiguous_eval_chunks():
    chunks = [contiguous_eval_chunks(10, 3, r) for r in range(3)]
    assert chunks[0] == [0, 1, 2, 3]
    assert chunks[1] == [4, 5, 6, 7]
    assert chunks[2] == [8, 9]
