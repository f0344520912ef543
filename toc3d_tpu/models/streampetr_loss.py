"""StreamPETR head losses: per-layer Hungarian set loss + denoising loss.

Parity target: reference streampetr_head.py:701-1047 (loss, loss_single,
dn_loss_single, _get_target_single).

Static-shape scatter trick: matched query indices of -1 (padded GT slots)
are redirected to a dummy row Q, and target arrays are allocated with Q+1
rows then sliced — no boolean indexing, no dynamic shapes.

Global-batch normalization: the reference sums positives per GPU and
reduce_means across GPUs (DDP then averages grads), which equals a global
sum normalization. Under pjit the batch axis is global, so we use global
sums directly.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.assigner import assign_3d
from ..core.boxes import normalize_bbox
from ..core.losses import sigmoid_focal_loss, l1_loss


def _scatter_targets(matched, gt_labels, gt_bboxes, gt_valid, num_query,
                     num_classes):
    """matched: (B, G) query index per gt (-1 invalid) ->
    labels (B, Q), bbox_targets (B, Q, D), bbox_weights (B, Q)."""
    b, g = matched.shape
    d = gt_bboxes.shape[-1]
    safe = jnp.where(matched >= 0, matched, num_query)     # dummy row
    bi = jnp.arange(b)[:, None]

    labels = jnp.full((b, num_query + 1), num_classes, jnp.int32)
    labels = labels.at[bi, safe].set(gt_labels.astype(jnp.int32))[:, :-1]

    bbox_t = jnp.zeros((b, num_query + 1, d), jnp.float32)
    bbox_t = bbox_t.at[bi, safe].set(gt_bboxes.astype(jnp.float32))[:, :-1]

    bbox_w = jnp.zeros((b, num_query + 1), jnp.float32)
    bbox_w = bbox_w.at[bi, safe].set(gt_valid.astype(jnp.float32))[:, :-1]
    return labels, bbox_t, bbox_w


def loss_single(cfg, cls_scores, bbox_preds, gt_bboxes, gt_labels, gt_valid):
    """One decoder layer's set loss.

    cls_scores: (B, Q, C) logits; bbox_preds: (B, Q, 10) with unnormalized
    centers; gt_bboxes: (B, G, 9) gravity-center (padded);
    gt_labels: (B, G); gt_valid: (B, G) bool.
    """
    b, q, c = cls_scores.shape
    matched = assign_3d(bbox_preds, cls_scores, gt_bboxes, gt_labels,
                        gt_valid, cfg.code_weights,
                        with_velo=False)
    matched = jax.lax.stop_gradient(matched)
    labels, bbox_t, pos_w = _scatter_targets(matched, gt_labels, gt_bboxes,
                                             gt_valid, q, cfg.num_classes)

    num_pos = jnp.sum(pos_w)
    cls_avg = jnp.maximum(num_pos, 1.0)           # bg_cls_weight == 0
    onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=jnp.float32)
    label_w = jnp.ones((b, q), jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_scores.astype(jnp.float32), onehot,
                                  label_w, cls_avg, loss_weight=2.0)

    norm_t = normalize_bbox(bbox_t)
    notnan = jnp.all(jnp.isfinite(norm_t), axis=-1)
    cw = jnp.asarray(cfg.code_weights, jnp.float32)
    w = pos_w[..., None] * cw * notnan[..., None]
    num_pos_r = jnp.maximum(num_pos, 1.0)
    loss_bbox = l1_loss(bbox_preds.astype(jnp.float32),
                        jnp.nan_to_num(norm_t), w, num_pos_r,
                        loss_weight=0.25)
    return jnp.nan_to_num(loss_cls), jnp.nan_to_num(loss_bbox)


def dn_loss_single(cfg, cls_scores, bbox_preds, known_labels, known_bboxs,
                   known_valid):
    """One layer's denoising loss (streampetr_head.py:881-937).

    cls_scores/bbox_preds: (B, P, ...) DN-slot predictions;
    known_labels: (B, P) (num_classes == negative); known_bboxs: (B, P, 9);
    known_valid: (B, P) bool (static-padding mask).
    """
    b, p, c = cls_scores.shape
    num_tgt = jnp.sum(known_valid.astype(jnp.float32))
    cls_avg = jnp.maximum(
        num_tgt * 3.14159 / 6 * cfg.split ** 3, 1.0)
    onehot = jax.nn.one_hot(known_labels, cfg.num_classes, dtype=jnp.float32)
    label_w = known_valid.astype(jnp.float32)
    loss_cls = sigmoid_focal_loss(cls_scores.astype(jnp.float32), onehot,
                                  label_w, cls_avg, loss_weight=2.0)

    norm_t = normalize_bbox(known_bboxs.astype(jnp.float32))
    notnan = jnp.all(jnp.isfinite(norm_t), axis=-1)
    cw = jnp.asarray(cfg.code_weights, jnp.float32)
    w = known_valid[..., None] * cw * notnan[..., None]
    loss_bbox = l1_loss(bbox_preds.astype(jnp.float32),
                        jnp.nan_to_num(norm_t), w, jnp.maximum(num_tgt, 1.0),
                        loss_weight=0.25)
    return (cfg.dn_weight * jnp.nan_to_num(loss_cls),
            cfg.dn_weight * jnp.nan_to_num(loss_bbox))


def streampetr_loss(cfg, outs, gt_bboxes, gt_labels, gt_valid, dn=None):
    """All-layer losses. outs: head_forward output dict.

    gt_bboxes: (B, G, 9) gravity-center (z at box center); gt_labels (B, G);
    gt_valid (B, G).
    Returns dict of scalar losses (frame-level keying added by caller).
    """
    all_cls = outs["all_cls_scores"]
    all_box = outs["all_bbox_preds"]
    n_layers = all_cls.shape[0]
    losses = {}
    for lvl in range(n_layers):
        lc, lb = loss_single(cfg, all_cls[lvl], all_box[lvl], gt_bboxes,
                             gt_labels, gt_valid)
        key = "" if lvl == n_layers - 1 else f"d{lvl}."
        losses[f"{key}loss_cls"] = lc
        losses[f"{key}loss_bbox"] = lb

    if dn is not None and "dn_cls_scores" in outs:
        for lvl in range(n_layers):
            lc, lb = dn_loss_single(cfg, outs["dn_cls_scores"][lvl],
                                    outs["dn_bbox_preds"][lvl],
                                    dn["known_labels"], dn["known_bboxs"],
                                    dn["known_valid"])
            key = "" if lvl == n_layers - 1 else f"d{lvl}."
            losses[f"{key}dn_loss_cls"] = lc
            losses[f"{key}dn_loss_bbox"] = lb
    return losses
