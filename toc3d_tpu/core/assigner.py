"""Hungarian set matching with static padded shapes.

Parity targets:
  HungarianAssigner3D -> reference core/bbox/assigners/hungarian_assigner_3d.py
      cost = FocalLossCost(w=2) + BBox3DL1Cost(w=0.25 via match_costs code
      weights) over normalized boxes; scipy linear_sum_assignment on CPU.
  HungarianAssigner2D -> reference core/bbox/assigners/hungarian_assigner_2d.py
      cost = FocalLossCost(2) + BBoxL1Cost(5, xywh) + IoUCost(giou, 2)
      + BBox3DL1Cost(10) on normalized centers.

TPU-native shape discipline: GT arrays are padded to a static G with a
validity mask. Padded columns get +INF-ish cost so the solver fills them
last; their matches are discarded by masking. The device->host round trip is
one pure_callback carrying the (batch, Q, G) cost tensor.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from .boxes import normalize_bbox
from .losses import _safe_pow, cxcywh_to_xyxy, giou_aligned

BIG_COST = 1e6


def _lsa_host(cost: np.ndarray, n_valid: np.ndarray) -> np.ndarray:
    """Host-side batched linear_sum_assignment.

    cost: (B, Q, G) float32; n_valid: (B,) int32.
    Returns (B, G) int32: for each gt slot, the matched query index
    (-1 for padded slots).

    Prefers the native C++ solver (toc3d_tpu/native/lap.cpp, one C call for
    the whole batch); falls back to per-sample scipy.
    """
    cost = np.nan_to_num(np.asarray(cost, np.float32), nan=100.0,
                         posinf=100.0, neginf=-100.0)
    b, q, g = cost.shape

    from ..native import lap_batched
    native = lap_batched(np.swapaxes(cost, 1, 2), np.asarray(n_valid))
    if native is not None:
        return native

    from scipy.optimize import linear_sum_assignment
    out = np.full((b, g), -1, np.int32)
    for i in range(int(b)):
        nv = int(n_valid[i])
        if nv == 0:
            continue
        rows, cols = linear_sum_assignment(cost[i, :, :nv])
        out[i, cols] = rows.astype(np.int32)
    return out


DEFAULT_IMPL = None  # resolved lazily: scipy callback on CPU, auction on TPU
_IMPL_OVERRIDE = None


def set_default_impl(impl):
    """Force the matcher implementation ('callback' | 'auction' | None).

    SPMD entry points (tools/train.py --distributed, __graft_entry__.
    dryrun_multichip) force 'auction': under a multi-device mesh the host
    callback gathers the whole (B, Q, G) cost tensor onto device 0 and
    broadcasts the result back (XLA logs 'Involuntary full
    rematerialization'), serializing every step — the exact scaling cliff
    the device auction avoids. The reference's scipy matching is per-rank
    local under DDP (hungarian_assigner_3d.py:72-82); auction-under-mesh is
    our shard-local equivalent (per-sample, no cross-device traffic) and is
    empirically exact at Q=900, G<=96 (tests/test_auction_scale.py).
    """
    global _IMPL_OVERRIDE
    assert impl in (None, "callback", "auction")
    _IMPL_OVERRIDE = impl


def resolve_impl() -> str:
    global DEFAULT_IMPL
    if _IMPL_OVERRIDE is not None:
        return _IMPL_OVERRIDE
    if DEFAULT_IMPL is None:
        DEFAULT_IMPL = ("callback" if jax.default_backend() == "cpu"
                        else "auction")
    return DEFAULT_IMPL


def hungarian_match(cost, n_valid, impl=None):
    """cost: (B, Q, G); n_valid: (B,) -> (B, G) matched query per gt (-1 pad).

    impl='callback': scipy linear_sum_assignment on the host via
    pure_callback (exactly the reference's CPU matching,
    hungarian_assigner_3d.py:72-82). impl='auction': device-native Bertsekas
    auction (core/auction.py) — required on the axon TPU backend, which does
    not support host callbacks. Default: callback on CPU, auction on TPU.
    """
    impl = impl or resolve_impl()
    b, q, g = cost.shape
    # matching is non-differentiable; the reference detaches the cost too
    # (hungarian_assigner_3d.py:73). stop_gradient also keeps the pure
    # callback out of JVP tracing.
    cost = jax.lax.stop_gradient(cost)
    n_valid = jax.lax.stop_gradient(n_valid)
    if impl == "auction":
        from .auction import hungarian_match_auction
        return hungarian_match_auction(cost, n_valid)
    return jax.pure_callback(
        _lsa_host,
        jax.ShapeDtypeStruct((b, g), jnp.int32),
        cost, n_valid.astype(jnp.int32),
        vmap_method="sequential")


# ---------------------------------------------------------------------------
# costs
# ---------------------------------------------------------------------------

def focal_cls_cost(cls_pred, gt_labels, weight=2.0, alpha=0.25, gamma=2.0,
                   eps=1e-12):
    """mmdet FocalLossCost. cls_pred: (Q, C) logits; gt_labels: (G,) int.
    Returns (Q, G)."""
    p = jax.nn.sigmoid(cls_pred.astype(jnp.float32))
    # clip-before-log, not additive eps: XLA:TPU folds `1 - p + eps` to
    # exactly 0 at p==1 (see losses.gaussian_focal_loss), and an inf cost
    # breaks both the host LSA and the device auction.
    neg = -jnp.log(jnp.clip(1 - p, eps, None)) * (1 - alpha) * _safe_pow(p, gamma)
    pos = -jnp.log(jnp.clip(p, eps, None)) * alpha * _safe_pow(1 - p, gamma)
    diff = pos - neg                     # (Q, C)
    return diff[:, gt_labels] * weight


def l1_cost(pred, target, weight):
    """(Q, D), (G, D) -> (Q, G) L1 distance."""
    return jnp.sum(jnp.abs(pred[:, None] - target[None]), axis=-1) * weight


def giou_cost(pred_xyxy, target_xyxy, weight=2.0):
    """(Q, 4), (G, 4) -> (Q, G) -GIoU."""
    g = giou_aligned(pred_xyxy[:, None], target_xyxy[None])
    return -g * weight


# ---------------------------------------------------------------------------
# 3D assignment (StreamPETRHead loss)
# ---------------------------------------------------------------------------

def assign_3d(bbox_pred, cls_pred, gt_bboxes, gt_labels, gt_valid,
              match_costs, cls_weight=2.0, reg_weight=0.25,
              with_velo=False):
    """Batched 3D Hungarian assignment.

    bbox_pred: (B, Q, 10) normalized code; cls_pred: (B, Q, C) logits;
    gt_bboxes: (B, G, 9) gravity-center boxes (padded); gt_labels: (B, G);
    gt_valid: (B, G) bool; match_costs: (10,) code weights.
    Returns matched_query (B, G) int32 (-1 invalid).
    """
    mc = jnp.asarray(match_costs, jnp.float32)

    def per_sample(bp, cp, gb, gl):
        cls_c = focal_cls_cost(cp, gl, weight=cls_weight)
        gt_norm = normalize_bbox(gb)
        bp_w = bp.astype(jnp.float32) * mc
        gt_w = gt_norm * mc
        if with_velo:
            reg_c = l1_cost(bp_w, gt_w, reg_weight)
        else:
            reg_c = l1_cost(bp_w[:, :8], gt_w[:, :8], reg_weight)
        return cls_c + reg_c

    cost = jax.vmap(per_sample)(bbox_pred, cls_pred, gt_bboxes, gt_labels)
    cost = jnp.where(gt_valid[:, None, :], cost, BIG_COST)
    n_valid = jnp.sum(gt_valid, axis=-1)
    matched = hungarian_match(cost, n_valid)
    return jnp.where(gt_valid, matched, -1)


# ---------------------------------------------------------------------------
# 2D assignment (FocalHead loss)
# ---------------------------------------------------------------------------

def assign_2d(bbox_pred, cls_pred, centers_pred, gt_bboxes, gt_labels,
              gt_centers, gt_valid, img_wh):
    """Batched 2D Hungarian assignment (hungarian_assigner_2d.py:124-146).

    bbox_pred: (B, Q, 4) normalized cxcywh; cls_pred: (B, Q, C) logits;
    centers_pred: (B, Q, 2) normalized; gt_bboxes: (B, G, 4) xyxy pixels;
    gt_centers: (B, G, 2) pixels; gt_valid: (B, G); img_wh: (w, h).
    """
    w, h = img_wh
    factor = jnp.asarray([w, h, w, h], jnp.float32)

    def per_sample(bp, cp, ctp, gb, gl, gc):
        gt_norm_xyxy = gb / factor
        from .losses import xyxy_to_cxcywh
        gt_cxcywh = xyxy_to_cxcywh(gt_norm_xyxy)
        cls_c = focal_cls_cost(cp, gl, weight=2.0)
        reg_c = l1_cost(bp, gt_cxcywh, 5.0)
        iou_c = giou_cost(cxcywh_to_xyxy(bp) * factor, gb, 2.0)
        ctr_c = l1_cost(ctp, gc / factor[:2], 10.0)
        return cls_c + reg_c + iou_c + ctr_c

    cost = jax.vmap(per_sample)(bbox_pred, cls_pred, centers_pred, gt_bboxes,
                                gt_labels, gt_centers)
    cost = jnp.where(gt_valid[:, None, :], cost, BIG_COST)
    matched = hungarian_match(cost, jnp.sum(gt_valid, axis=-1))
    return jnp.where(gt_valid, matched, -1)
