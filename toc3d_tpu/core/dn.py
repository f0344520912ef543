"""Denoising (DN) query preparation with static shapes.

Parity target: reference streampetr_head.py:455-537 (prepare_for_dn).

The reference pads to the dynamic per-batch max GT count; we pad to the
static cfg.dn_max_gt (invalid slots carry zero boxes and are masked out of
the DN loss — they stay background-labeled like the reference's padding
slots, which receive no supervision there either; here they are simply
weight-0 in the loss).
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def prepare_for_dn(rng, cfg, gt_bboxes, gt_labels, gt_valid):
    """Build noised DN reference points + attention mask.

    rng: PRNG key; cfg: StreamPETRHeadConfig;
    gt_bboxes: (B, G, >=7) gravity-center boxes (padded);
    gt_labels: (B, G) int; gt_valid: (B, G) bool. G == cfg.dn_max_gt.

    Returns dict:
      padded_reference_points (B, P+Q, 3) with P = scalar*G,
      attn_mask (P+Q+propagated, P+Q+memory_len) bool (True = masked),
      pad_size P, known_labels (B, P), known_bboxs (B, P, 10-ish),
      known_valid (B, P) bool.
    """
    b, g = gt_labels.shape
    s = cfg.scalar
    p = s * g
    pc = jnp.asarray(cfg.pc_range, jnp.float32)

    center = gt_bboxes[..., :3]
    scale = gt_bboxes[..., 3:6]

    # replicate per noise group: (B, S, G, ...)
    center = jnp.broadcast_to(center[:, None], (b, s, g, 3))
    scale = jnp.broadcast_to(scale[:, None], (b, s, g, 3))
    labels = jnp.broadcast_to(gt_labels[:, None], (b, s, g))

    diff = scale / 2 + cfg.noise_trans
    rand_prob = jax.random.uniform(rng, (b, s, g, 3), jnp.float32,
                                   -1.0, 1.0)
    noised = center + rand_prob * diff * cfg.noise_scale
    noised = (noised - pc[0:3]) / (pc[3:6] - pc[0:3])
    noised = jnp.clip(noised, 0.0, 1.0)
    # far-noised boxes become negatives (label = num_classes)
    flip = jnp.linalg.norm(rand_prob, axis=-1) > cfg.split
    labels = jnp.where(flip, cfg.num_classes, labels)

    valid = jnp.broadcast_to(gt_valid[:, None], (b, s, g))
    noised = jnp.where(valid[..., None], noised, 0.0)

    known_ref = noised.reshape(b, p, 3)
    known_labels = labels.reshape(b, p)
    known_valid = valid.reshape(b, p)
    known_bboxs = jnp.broadcast_to(
        gt_bboxes[:, None], (b, s) + gt_bboxes.shape[1:]).reshape(
            b, p, gt_bboxes.shape[-1])

    # attention mask (streampetr_head.py:502-521):
    q = cfg.num_query
    qs = p + q + cfg.num_propagated
    ks = p + q + cfg.memory_len
    qi = jnp.arange(qs)
    ki = jnp.arange(ks)
    q_group = jnp.where(qi < p, qi // g, -1)          # -1 = matching queries
    k_group = jnp.where(ki < p, ki // g, -1)
    mask = jnp.zeros((qs, ks), bool)
    # DN groups cannot see other DN groups
    dn_q = q_group[:, None] >= 0
    dn_k = k_group[None, :] >= 0
    mask |= dn_q & dn_k & (q_group[:, None] != k_group[None, :])
    # matching (and propagated) queries cannot see any DN keys
    mask |= (~dn_q) & dn_k
    return {
        "known_ref": known_ref,
        "attn_mask": mask,
        "pad_size": p,
        "known_labels": known_labels,
        "known_bboxs": known_bboxs,
        "known_valid": known_valid,
    }


def dn_reference_points(dn: Dict, reference_points, batch_size: int):
    """Concatenate DN refs with the learnable query refs
    (streampetr_head.py:492-499). reference_points: (Q, 3) params."""
    q_ref = jnp.broadcast_to(reference_points[None],
                             (batch_size,) + reference_points.shape)
    return jnp.concatenate([dn["known_ref"], q_ref], axis=1)
