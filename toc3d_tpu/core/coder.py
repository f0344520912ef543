"""NMS-free box decoding (top-300 over query x class).

Parity target: reference core/bbox/coders/nms_free_coder.py:39-111.

jit-friendly: returns a fixed max_num boxes plus a validity mask (the
post-center-range filter); host code applies the mask.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .boxes import denormalize_bbox


class DecodedBoxes(NamedTuple):
    bboxes: jnp.ndarray   # (B, max_num, 9) gravity-center boxes
    scores: jnp.ndarray   # (B, max_num)
    labels: jnp.ndarray   # (B, max_num) int32
    valid: jnp.ndarray    # (B, max_num) bool


def nms_free_decode(all_cls_scores, all_bbox_preds, num_classes: int,
                    max_num: int, post_center_range) -> DecodedBoxes:
    """Decode the last decoder layer's predictions.

    all_cls_scores: (L, B, Q, num_classes) logits;
    all_bbox_preds: (L, B, Q, 10) with unnormalized centers.
    """
    cls = jax.nn.sigmoid(all_cls_scores[-1])          # (B, Q, C)
    box = all_bbox_preds[-1]
    b, q, c = cls.shape

    flat = cls.reshape(b, q * c)
    scores, idx = jax.lax.top_k(flat, max_num)        # (B, max_num)
    labels = idx % num_classes
    bbox_index = idx // num_classes
    box = jnp.take_along_axis(box, bbox_index[..., None], axis=1)
    final = denormalize_bbox(box)                     # (B, max_num, 9)

    pcr = jnp.asarray(post_center_range, final.dtype)
    mask = jnp.all(final[..., :3] >= pcr[:3], axis=-1)
    mask &= jnp.all(final[..., :3] <= pcr[3:], axis=-1)
    return DecodedBoxes(final, scores, labels.astype(jnp.int32), mask)


def to_bottom_center(bboxes):
    """Gravity-center z -> bottom-center z (get_bboxes, streampetr
    head.py:1066: bboxes[:, 2] -= h * 0.5)."""
    z = bboxes[..., 2:3] - bboxes[..., 5:6] * 0.5
    return jnp.concatenate([bboxes[..., :2], z, bboxes[..., 3:]], axis=-1)
