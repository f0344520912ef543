"""PETRHeadDN — non-streaming DN-PETR head (no temporal memory bank).

Parity target: reference projects/mmdet3d_plugin/models/dense_heads/
petr_head_dn.py (registered but unused by the shipped ToC3D configs —
component inventory, SURVEY.md §2a). Identical to StreamPETRHead minus
pre/post memory updates, temporal alignment, ego-motion conditioning, and
propagated queries; the decoder self-attends over queries only.

Shares parameters/pieces with streampetr_head: build params with
init_petr_head_dn (init_streampetr_head with num_propagated=0,
with_ego_pos=False, memory_len=0).
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp

from ..layers import mlp_relu, mln, se_linear, linear, layer_norm, inverse_sigmoid
from ..ops.posenc import pos2posemb3d
from .petr_transformer import decoder_forward
from .streampetr_head import (StreamPETRHeadConfig, init_streampetr_head,
                              location_grid, position_embeding,
                              cls_branch_forward, reg_branch_forward)


def petr_head_dn_config(**kw) -> StreamPETRHeadConfig:
    defaults = dict(num_query=900, memory_len=0, num_propagated=0,
                    topk_proposals=0, with_ego_pos=False)
    defaults.update(kw)
    return StreamPETRHeadConfig(**defaults)


def init_petr_head_dn(key, cfg: StreamPETRHeadConfig):
    assert cfg.num_propagated == 0 and not cfg.with_ego_pos
    return init_streampetr_head(key, cfg)


def petr_head_dn_forward(params, cfg: StreamPETRHeadConfig, feats, data,
                         topk_indexes=None, dn=None, rng=None,
                         remat: bool = False, fused_ok: bool = True):
    """One frame (petr_head_dn.py:437-512). feats: (B, N, h, w, C)."""
    b, n, h, w, c = feats.shape
    memory = feats.reshape(b, n * h * w, c)
    from ..ops.gather import topk_gather
    memory = topk_gather(memory, topk_indexes)

    centers = location_grid(h, w, cfg.stride, *data["pad_shape"])
    pos_embed, cone = position_embeding(params, cfg, data, centers,
                                        topk_indexes)
    memory = mlp_relu(params["memory_embed"], memory)
    memory = mln(params["spatial_alignment"], memory,
                 cone.astype(memory.dtype))
    pos_embed = se_linear(params["featurized_pe"], pos_embed, memory)

    if dn is not None:
        reference_points = dn["padded_reference_points"]
        attn_mask = dn["attn_mask"]
        pad_size = dn["pad_size"]
    else:
        reference_points = jnp.broadcast_to(
            params["reference_points"][None], (b, cfg.num_query, 3))
        attn_mask = None
        pad_size = 0

    query_pos = mlp_relu(params["query_embedding"],
                         pos2posemb3d(reference_points,
                                      num_pos_feats=cfg.embed_dims // 2))
    tgt = jnp.zeros_like(query_pos)

    outs_dec, _ = decoder_forward(params["decoder"], cfg.decoder, tgt,
                                  memory, query_pos, pos_embed, attn_mask,
                                  rng=rng, remat=remat, fused_ok=fused_ok)
    outs_dec = jnp.nan_to_num(outs_dec)

    ref_inv = inverse_sigmoid(jnp.clip(reference_points, 0.0, 1.0))
    all_cls, all_box = [], []
    for lvl in range(outs_dec.shape[0]):
        cls = cls_branch_forward(params["cls_branch"], outs_dec[lvl])
        tmp = reg_branch_forward(params["reg_branch"], outs_dec[lvl])
        xyz = jax.nn.sigmoid(tmp[..., 0:3] + ref_inv)
        all_cls.append(cls)
        all_box.append(jnp.concatenate([xyz, tmp[..., 3:]], axis=-1))
    all_cls_scores = jnp.stack(all_cls)
    all_bbox_preds = jnp.stack(all_box)
    pc = jnp.asarray(cfg.pc_range, all_bbox_preds.dtype)
    xyz = all_bbox_preds[..., 0:3] * (pc[3:6] - pc[0:3]) + pc[0:3]
    all_bbox_preds = jnp.concatenate([xyz, all_bbox_preds[..., 3:]], axis=-1)

    if pad_size > 0:
        return {
            "all_cls_scores": all_cls_scores[:, :, pad_size:],
            "all_bbox_preds": all_bbox_preds[:, :, pad_size:],
            "dn_cls_scores": all_cls_scores[:, :, :pad_size],
            "dn_bbox_preds": all_bbox_preds[:, :, :pad_size],
        }
    return {"all_cls_scores": all_cls_scores,
            "all_bbox_preds": all_bbox_preds}
