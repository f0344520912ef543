"""Detection-level fast-vs-exact decode agreement (VERDICT r4 #5).

The pixel-level parity test (test_data_pipeline.test_eval_frame_fast_decode)
runs on random-noise JPEGs — the adversarial case for resampling — and only
bounds mean pixel diff. This test closes the loop the serving flag actually
changes: PHOTO-LIKE JPEGs (smooth gradients + mild texture, the realistic
nuScenes camera content class, same generator family as
tools/host_pipeline_bench.py) through the REAL eval path
(build_eval_frame -> streaming make_infer_fn -> decoded boxes), asserting
the detections a user would submit agree between

  exact:  full-resolution cv2/PIL decode + host normalize (reference
          semantics, transform_3d.py:131)
  fast:   cv2 IMREAD_REDUCED / PIL-draft decode + uint8 payload with
          device-side normalization (tools/test.py --fast-decode)

Agreement bars were calibrated on this fixture (measured: score spearman
1.0000, top-10 sets identical, NN-matched center shift <=0.17 m, max score
delta 2e-4) and carry >=3x margin; a layout/BGR/scale regression in the
fast path lands orders of magnitude outside them. Boxes are compared via
greedy nearest-neighbor SET matching of the two top-10 lists, not per
query slot: with random-init near-tie scores, streaming memory-bank top-k
propagation permutes which query occupies which slot between two runs
whose inputs differ by resampling noise (the known selection-flip effect,
CLAUDE.md), so per-slot box comparison is chaotic while the detection SET
a submission carries is stable.
"""
import os
import pickle

import numpy as np
import jax
import pytest

from toc3d_tpu.data.nuscenes import NuScenesInfos, AugConfig
from toc3d_tpu.data.loader import build_eval_frame

TINY_AUG = AugConfig(resize_lim=(0.7, 0.9), final_dim=(64, 128),
                     H=360, W=640, rand_flip=True)


def make_photo_dataset(tmpdir, n_frames=3, n_cams=2, src_h=360, src_w=640):
    """Photo-like JPEGs: smooth gradients + mild texture at realistic
    quality (q90) — the content class real camera JPEGs occupy, vs the
    noise worst case of test_data_pipeline.make_synthetic_dataset."""
    from PIL import Image

    rng = np.random.RandomState(0)
    yy, xx = np.mgrid[0:src_h, 0:src_w]
    base = np.stack([(xx / 8 + yy / 12) % 255, (xx / 6) % 255,
                     (yy / 9) % 255], -1)
    base = (base * 0.7 + rng.randn(src_h, src_w, 3) * 8)
    base = base.clip(0, 255).astype(np.uint8)

    img_dir = os.path.join(tmpdir, "imgs")
    os.makedirs(img_dir, exist_ok=True)
    infos = []
    t = 1_600_000_000_000_000
    intr = np.eye(3)
    intr[0, 0] = intr[1, 1] = 500.0
    intr[0, 2], intr[1, 2] = src_w / 2, src_h / 2
    for f in range(n_frames):
        cams = {}
        for c in range(n_cams):
            path = os.path.join(img_dir, f"f{f}_c{c}.jpg")
            Image.fromarray(np.roll(base, f * 31 + c * 7, axis=1)).save(
                path, quality=90)
            cams[f"CAM{c}"] = {
                "data_path": path,
                "cam_intrinsic": intr,
                "sensor2lidar_rotation": np.eye(3),
                "sensor2lidar_translation": np.zeros(3),
                "timestamp": t,
            }
        infos.append({
            "cams": cams, "token": f"f{f}", "scene_token": "scene0",
            "timestamp": t, "prev": "" if f == 0 else f"f{f-1}", "next": "",
            "frame_idx": f, "lidar_path": "none.bin",
            "sweeps": [] if f == 0 else [{"fake": 1}],
            "ego2global_rotation": [1, 0, 0, 0],
            "ego2global_translation": [0.1 * f, 0.0, 0.0],
            "lidar2ego_rotation": [1, 0, 0, 0],
            "lidar2ego_translation": [0.0, 0.0, 1.5],
            "gt_boxes": np.zeros((0, 7)), "gt_velocity": np.zeros((0, 2)),
            "gt_names": np.array([], dtype=object),
            "valid_flag": np.ones(0, bool),
            "num_lidar_pts": np.zeros(0, np.int64),
        })
        t += 500_000
    path = os.path.join(tmpdir, "infos.pkl")
    with open(path, "wb") as fh:
        pickle.dump({"infos": infos,
                     "metadata": {"version": "v1.0-test-synthetic"}}, fh)
    return path


def _stream(infos, cfg, fast):
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           make_infer_fn)
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    infer = make_infer_fn(cfg)
    state = init_state(1, cfg)
    dets = []
    prev_scene = None
    for i in range(len(infos)):
        kw = dict(fast_decode=True, device_normalize=True) if fast else {}
        frame, meta = build_eval_frame(infos, i, TINY_AUG, **kw)
        frame["prev_exists"][:] = float(meta["scene_token"] == prev_scene)
        prev_scene = meta["scene_token"]
        state, det = infer(params, state, frame)
        dets.append({k: np.asarray(v[0]) for k, v in
                     zip(det._fields, det)})
    return dets


def test_fast_decode_detection_agreement(tmp_path):
    from scipy.stats import spearmanr
    from toc3d_tpu.configs import get_config

    path = make_photo_dataset(str(tmp_path))
    infos = NuScenesInfos(path)
    cfg = get_config("tiny")

    exact = _stream(infos, cfg, fast=False)
    fast = _stream(infos, cfg, fast=True)

    for de, df in zip(exact, fast):
        se, sf = de["scores"], df["scores"]
        # score rank order survives the decode swap
        rho = spearmanr(se, sf).statistic
        assert rho > 0.99, rho
        ke = np.argsort(-se)[:10]
        kf = np.argsort(-sf)[:10]
        assert len(set(ke.tolist()) & set(kf.tolist())) >= 9, (ke, kf)
        # the detection SET a submission would carry agrees: greedy NN
        # matching of the two top-10 center lists (slot identity is not
        # stable under near-tie top-k flips; the set is — see docstring)
        ce = de["bboxes"][ke][:, :3]
        cf = df["bboxes"][kf][:, :3]
        dist = np.linalg.norm(ce[:, None, :] - cf[None, :, :], axis=-1)
        used = np.zeros(len(kf), bool)
        shifts = []
        for r in range(len(ke)):
            j = int(np.argmin(np.where(used, np.inf, dist[r])))
            used[j] = True
            shifts.append(dist[r, j])
        assert max(shifts) < 0.5, sorted(np.round(shifts, 3))
        assert float(np.abs(se - sf).max()) < 0.02, \
            float(np.abs(se - sf).max())
