"""3D box math: normalized 10-dim box codes, ego transforms, and the LiDAR
box convention used by nuScenes evaluation.

Parity targets:
  normalize_bbox / denormalize_bbox -> reference core/bbox/util.py:3-51
  transform_reference_points        -> reference models/utils/misc.py:191-200
  LiDARInstance3DBoxes semantics    -> vendored mmdet3d
      core/bbox/structures/lidar_box3d.py (gravity_center, bev, rotate, flip)

Box tensor layout (mmdet3d LiDAR, box_dim=9):
  [x, y, z_bottom, w(dx), l(dy), h(dz), yaw, vx, vy]
The 10-dim normalized code is
  [cx, cy, cz, log w, log l, log h, sin yaw, cos yaw, vx, vy].
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_bbox(bboxes, pc_range=None):
    """bboxes: (..., >=7) gravity-center boxes -> (..., 8 or 10) code."""
    cx, cy, cz = bboxes[..., 0:1], bboxes[..., 1:2], bboxes[..., 2:3]
    w = jnp.log(bboxes[..., 3:4])
    l = jnp.log(bboxes[..., 4:5])
    h = jnp.log(bboxes[..., 5:6])
    rot = bboxes[..., 6:7]
    parts = [cx, cy, cz, w, l, h, jnp.sin(rot), jnp.cos(rot)]
    if bboxes.shape[-1] > 7:
        parts += [bboxes[..., 7:8], bboxes[..., 8:9]]
    return jnp.concatenate(parts, axis=-1)


def denormalize_bbox(code, pc_range=None):
    """code: (..., 8 or 10) -> (..., 7 or 9) gravity-center boxes."""
    rot = jnp.arctan2(code[..., 6:7], code[..., 7:8])
    cx, cy, cz = code[..., 0:1], code[..., 1:2], code[..., 2:3]
    w = jnp.exp(code[..., 3:4])
    l = jnp.exp(code[..., 4:5])
    h = jnp.exp(code[..., 5:6])
    parts = [cx, cy, cz, w, l, h, rot]
    if code.shape[-1] > 8:
        parts += [code[..., 8:9], code[..., 9:10]]
    return jnp.concatenate(parts, axis=-1)


def transform_reference_points(reference_points, egopose, reverse=False,
                               translation=True):
    """reference_points: (B, N, 3); egopose: (B, 4, 4) -> (B, N, 3)."""
    pts = jnp.concatenate(
        [reference_points, jnp.ones_like(reference_points[..., :1])], axis=-1)
    matrix = jnp.linalg.inv(egopose) if reverse else egopose
    if not translation:
        matrix = matrix.at[..., :3, 3].set(0.0)
    out = jnp.einsum("bij,bnj->bni", matrix, pts)
    return out[..., :3]


# ---------------------------------------------------------------------------
# LiDAR box helpers (numpy, host-side: dataset/eval path)
# ---------------------------------------------------------------------------

def gravity_center(boxes: np.ndarray) -> np.ndarray:
    """boxes: (N, >=7) bottom-center convention -> (N, 3) gravity centers."""
    out = boxes[:, :3].copy()
    out[:, 2] = boxes[:, 2] + boxes[:, 5] * 0.5
    return out


def boxes_with_gravity_center(boxes: np.ndarray) -> np.ndarray:
    """(N, D) bottom-center boxes -> (N, D) with center z (loss/assign target
    layout used by StreamPETRHead.loss, streampetr_head.py:982-984)."""
    out = boxes.copy()
    out[:, 2] = boxes[:, 2] + boxes[:, 5] * 0.5
    return out


def rotate_boxes_z(boxes: np.ndarray, angle: float) -> np.ndarray:
    """Rotate LiDAR boxes around z by `angle` (radians), mmdet3d convention
    (lidar_box3d.py:91-141: x' = x cos + y sin... uses T @ rot_mat)."""
    rot_sin, rot_cos = np.sin(angle), np.cos(angle)
    rot = np.array([[rot_cos, rot_sin, 0],
                    [-rot_sin, rot_cos, 0],
                    [0, 0, 1]], dtype=boxes.dtype)
    out = boxes.copy()
    out[:, :3] = boxes[:, :3] @ rot
    out[:, 6] = boxes[:, 6] + angle
    if boxes.shape[1] == 9:
        out[:, 7:9] = boxes[:, 7:9] @ rot[:2, :2]
    return out


def flip_boxes(boxes: np.ndarray, direction="horizontal") -> np.ndarray:
    """Flip in BEV (lidar_box3d.py:143-166)."""
    out = boxes.copy()
    if direction == "horizontal":
        out[:, 1] = -boxes[:, 1]
        out[:, 6] = -boxes[:, 6]
        if boxes.shape[1] == 9:
            out[:, 8] = -boxes[:, 8]
    elif direction == "vertical":
        out[:, 0] = -boxes[:, 0]
        out[:, 6] = -boxes[:, 6] + np.pi
        if boxes.shape[1] == 9:
            out[:, 7] = -boxes[:, 7]
    return out


def scale_boxes(boxes: np.ndarray, scale: float) -> np.ndarray:
    """Scale position/size/velocity (base_box3d.py:263)."""
    out = boxes.copy()
    out[:, :6] = boxes[:, :6] * scale
    if boxes.shape[1] == 9:
        out[:, 7:9] = boxes[:, 7:9] * scale
    return out


def translate_boxes(boxes: np.ndarray, trans) -> np.ndarray:
    out = boxes.copy()
    out[:, :3] = boxes[:, :3] + np.asarray(trans, boxes.dtype)
    return out


def in_range_bev(boxes: np.ndarray, bev_range) -> np.ndarray:
    """(N,) bool mask, mmdet3d in_range_bev semantics (x1<x<x2, y1<y<y2)."""
    return ((boxes[:, 0] > bev_range[0]) & (boxes[:, 1] > bev_range[1])
            & (boxes[:, 0] < bev_range[2]) & (boxes[:, 1] < bev_range[3]))


def limit_yaw(boxes: np.ndarray, offset=0.5, period=np.pi * 2) -> np.ndarray:
    out = boxes.copy()
    out[:, 6] = boxes[:, 6] - np.floor(boxes[:, 6] / period + offset) * period
    return out
