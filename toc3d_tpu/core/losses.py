"""Loss primitives — static-shape, mask-weighted, mmdet-semantics.

Parity targets:
  sigmoid focal loss      -> reference models/losses/focal_loss.py:10-102
                             (pure-python path; gamma=2, alpha=0.25)
  L1 / weight-reduce      -> mmdet l1_loss + models/losses/utils.py
  GaussianFocalLoss       -> mmdet (alpha=2, gamma=4), used by
                             TokenSelectionLoss and FocalHead centerness
  QualityFocalLoss        -> mmdet (beta=2), FocalHead cls
  GIoU                    -> mmdet giou_loss / IoUCost
  TokenSelectionLoss      -> reference models/losses/token_selection_loss.py

All losses take elementwise `weight` arrays and an `avg_factor`; invalid
(padded) entries carry weight 0 so shapes stay static.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def weight_reduce_sum(loss, weight, avg_factor):
    """sum(loss * weight) / avg_factor (mmdet weight_reduce_loss, 'mean'
    reduction with explicit avg_factor)."""
    return jnp.sum(loss * weight) / jnp.maximum(avg_factor, 1e-12)


# ---------------------------------------------------------------------------
# classification
# ---------------------------------------------------------------------------

def _safe_pow(x, p):
    """x ** p without the exp(p*log(x)) lowering for integral p: XLA:TPU's
    bf16 float-pow produces NaN at the 0/1 endpoints (observed: 2.8% of
    gaussian-focal elements NaN on TPU for masks saturated to exactly 0/1
    in bf16, while the identical CPU computation is finite)."""
    return (jax.lax.integer_pow(x, int(p)) if float(p).is_integer()
            else x ** p)


def sigmoid_focal_loss(pred, target_onehot, weight, avg_factor,
                       gamma=2.0, alpha=0.25, loss_weight=2.0):
    """pred: (..., C) logits; target_onehot: (..., C) in {0,1};
    weight: (...,) per-anchor. Computed in f32 regardless of input dtype —
    the reference runs all losses under mmcv force_fp32."""
    pred = pred.astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    t = target_onehot.astype(p.dtype)
    pt = (1 - p) * t + p * (1 - t)
    focal_weight = (alpha * t + (1 - alpha) * (1 - t)) * _safe_pow(pt, gamma)
    bce = _bce_with_logits(pred, t)
    loss = bce * focal_weight
    return loss_weight * weight_reduce_sum(loss, weight[..., None], avg_factor)


def _bce_with_logits(logits, targets):
    # numerically-stable BCE, matches F.binary_cross_entropy_with_logits
    return (jnp.maximum(logits, 0) - logits * targets
            + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def quality_focal_loss(pred, labels, quality, weight, avg_factor,
                       num_classes, beta=2.0, loss_weight=2.0):
    """mmdet QualityFocalLoss with (label, IoU-quality) targets.

    pred: (N, C) logits; labels: (N,) int (num_classes = bg);
    quality: (N,) IoU score for positives.
    """
    pred = pred.astype(jnp.float32)
    p = jax.nn.sigmoid(pred)
    # negatives: target 0, weight p^beta
    loss = _bce_with_logits(pred, jnp.zeros_like(pred)) * _safe_pow(p, beta)
    pos = labels < num_classes
    lab = jnp.where(pos, labels, 0)
    onehot = jax.nn.one_hot(lab, num_classes, dtype=pred.dtype)
    q = quality[..., None].astype(pred.dtype)
    pos_loss = (_bce_with_logits(pred, q * onehot)
                * _safe_pow(jnp.abs(q * onehot - p), beta))
    loss = jnp.where(pos[..., None] & (onehot > 0), pos_loss, loss)
    return loss_weight * weight_reduce_sum(loss, weight[..., None], avg_factor)


def gaussian_focal_loss(pred, target, weight, avg_factor=None,
                        alpha=2.0, gamma=4.0, loss_weight=1.0, eps=1e-12):
    """mmdet GaussianFocalLoss: pred in (0,1), gaussian-heatmap target.
    f32 + integer powers (see _safe_pow): bf16 preds saturate to exactly
    0/1 and TPU's float-pow lowering NaNs at those endpoints.

    The log arguments are clamped with clip, NOT the mmdet additive
    `1 - pred + eps`: XLA:TPU evaluates `1.0 - x + 1e-12` as exactly 0.0
    at x==1 (the eps is folded away), so `log(...) -> -inf` and the
    `inf * 0` against the opposite-branch weight made NaN — this was the
    "train-step non-finite" bug on axon (bisected 2026-08-17, probe:
    tools/semantic_nan_probe.py). Branches are selected with `where` so
    no inf can ever multiply a zero weight, forward or backward."""
    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    neg_w = _safe_pow(1 - target, gamma)
    log_p = jnp.log(jnp.clip(pred, eps, None))
    log_q = jnp.log(jnp.clip(1.0 - pred, eps, None))
    pos_loss = -log_p * _safe_pow(1 - pred, alpha)
    neg_loss = -log_q * _safe_pow(pred, alpha) * neg_w
    loss = jnp.where(target == 1.0, pos_loss, neg_loss)
    if avg_factor is None:
        # 'mean' reduction over weighted elements (mmdet default)
        return loss_weight * jnp.sum(loss * weight) / jnp.maximum(
            jnp.sum(jnp.ones_like(loss) * (weight > 0)), 1.0)
    return loss_weight * weight_reduce_sum(loss, weight, avg_factor)


# ---------------------------------------------------------------------------
# regression
# ---------------------------------------------------------------------------

def l1_loss(pred, target, weight, avg_factor, loss_weight=1.0):
    loss = jnp.abs(pred - target)
    return loss_weight * weight_reduce_sum(loss, weight, avg_factor)


def clip_sigmoid(x, eps=1e-4):
    """mmdet3d clip_sigmoid (models/utils/clip_sigmoid.py:5)."""
    return jnp.clip(jax.nn.sigmoid(x), eps, 1 - eps)


# ---------------------------------------------------------------------------
# 2D box utilities + GIoU
# ---------------------------------------------------------------------------

def cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)


def xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack([(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1)


def bbox_overlaps_aligned(a, b, eps=1e-6):
    """IoU of aligned box pairs, xyxy. a, b: (..., 4) -> (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    return inter / jnp.maximum(area_a + area_b - inter, eps)


def giou_aligned(a, b, eps=1e-7):
    """GIoU of aligned pairs, xyxy -> (...)."""
    lt = jnp.maximum(a[..., :2], b[..., :2])
    rb = jnp.minimum(a[..., 2:], b[..., 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[..., 2] - a[..., 0]) * (a[..., 3] - a[..., 1])
    area_b = (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])
    union = jnp.maximum(area_a + area_b - inter, eps)
    iou = inter / union
    lt_e = jnp.minimum(a[..., :2], b[..., :2])
    rb_e = jnp.maximum(a[..., 2:], b[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0)
    enclose = jnp.maximum(wh_e[..., 0] * wh_e[..., 1], eps)
    return iou - (enclose - union) / enclose


def giou_loss(pred_xyxy, target_xyxy, weight, avg_factor, loss_weight=2.0):
    loss = 1.0 - giou_aligned(pred_xyxy, target_xyxy)
    return loss_weight * weight_reduce_sum(loss, weight, avg_factor)


def kl_div_loss(pred_log_probs, target_probs, weight=None, avg_factor=None,
                loss_weight=1.0):
    """KL divergence (reference models/losses/kl_loss.py — registered for
    distillation experiments; batchmean semantics)."""
    loss = target_probs * (jnp.log(jnp.clip(target_probs, 1e-12))
                           - pred_log_probs)
    if weight is not None:
        loss = loss * weight
    denom = (jnp.maximum(avg_factor, 1e-12) if avg_factor is not None
             else pred_log_probs.shape[0])
    return loss_weight * jnp.sum(loss) / denom


# ---------------------------------------------------------------------------
# token selection loss
# ---------------------------------------------------------------------------

def token_selection_targets(gt_bboxes2d, gt_valid, mask_h, mask_w,
                            patch_size=16, bg_mask_value=0.0):
    """Rasterize 2D GT boxes to the patch grid.

    gt_bboxes2d: (V, G, 4) xyxy pixels; gt_valid: (V, G) bool.
    Returns (V, mask_h, mask_w) with 1 inside any box, bg_mask_value outside
    (token_selection_loss.py:22-51).
    """
    tl_x = jnp.clip(jnp.floor(gt_bboxes2d[..., 0] / patch_size), 0)
    tl_y = jnp.clip(jnp.floor(gt_bboxes2d[..., 1] / patch_size), 0)
    br_x = jnp.clip(jnp.ceil(gt_bboxes2d[..., 2] / patch_size), None,
                    mask_w - 1)
    br_y = jnp.clip(jnp.ceil(gt_bboxes2d[..., 3] / patch_size), None,
                    mask_h - 1)
    ys = jnp.arange(mask_h, dtype=jnp.float32)
    xs = jnp.arange(mask_w, dtype=jnp.float32)
    # half-open ranges [tl, br) like the python slice in the reference
    in_y = (ys[None, None, :] >= tl_y[..., None]) & (ys[None, None, :]
                                                     < br_y[..., None])
    in_x = (xs[None, None, :] >= tl_x[..., None]) & (xs[None, None, :]
                                                     < br_x[..., None])
    inside = (in_y[..., :, None] & in_x[..., None, :])      # (V, G, H, W)
    inside &= gt_valid[..., None, None]
    any_box = jnp.any(inside, axis=1)
    return jnp.where(any_box, 1.0, bg_mask_value)


def token_selection_loss(pred_masks, gt_bboxes2d, gt_valid, patch_size=16,
                         loss_weight=5.0, bg_mask_value=0.0):
    """pred_masks: (L, V, H, W) soft keep-probabilities in (0,1);
    gt_bboxes2d: (V, G, 4); gt_valid: (V, G)."""
    l, v, h, w = pred_masks.shape
    target = token_selection_targets(gt_bboxes2d, gt_valid, h, w, patch_size,
                                     bg_mask_value)
    target = jnp.broadcast_to(target[None], pred_masks.shape)
    weight = jnp.ones_like(pred_masks)
    return gaussian_focal_loss(pred_masks, target, weight, avg_factor=None,
                               loss_weight=loss_weight)
