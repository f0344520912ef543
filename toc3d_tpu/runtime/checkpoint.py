"""Checkpoint conversion: reference torch .pth state dicts <-> our param
pytrees, plus orbax save/load.

Parity targets:
  key layout      -> reference module trees (eva_vit.py, toc3d_eva_vit.py,
                     streampetr_head.py, cp_fpn.py, focal_head.py)
  legacy renames  -> StreamPETRHead._load_from_state_dict shim
                     (streampetr_head.py:539-567)
  shared branches -> cls/reg heads are aliased across decoder layers
                     (streampetr_head.py:257-260), so cls_branches.0.* is
                     the single source of truth

Conventions: torch Linear weight (out, in) -> ours (in, out) [transpose];
torch Conv2d weight (out, in, kh, kw) -> ours (kh, kw, in, out); packed MHA
in_proj splits into q/k/v.
"""
from __future__ import annotations

import re
from typing import Dict, Optional

import numpy as np

LEGACY_RENAMES = {
    ".self_attn.": ".attentions.0.",
    ".multihead_attn.": ".attentions.1.",
    ".decoder.norm.": ".decoder.post_norm.",
}


def _np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    sd = {k: _np(v) for k, v in sd.items()}
    out = {}
    for k, v in sd.items():
        for old, new in LEGACY_RENAMES.items():
            if old in k:
                k = k.replace(old, new)
        out[k] = v
    return out


class _SD:
    """State-dict view with prefix tracking + consumption accounting."""

    def __init__(self, sd: Dict[str, np.ndarray], prefix: str = ""):
        self.sd = sd
        self.prefix = prefix
        self.used = set()

    def sub(self, name: str) -> "_SD":
        s = _SD(self.sd, self.prefix + name + ".")
        s.used = self.used
        return s

    def get(self, name: str, transpose=False) -> np.ndarray:
        key = self.prefix + name
        self.used.add(key)
        v = self.sd[key].astype(np.float32)
        return v.T if transpose else v

    def has(self, name: str) -> bool:
        return (self.prefix + name) in self.sd

    def linear(self, name: str, bias=True):
        p = {"w": self.get(f"{name}.weight", transpose=True)}
        if bias and self.has(f"{name}.bias"):
            p["b"] = self.get(f"{name}.bias")
        return p

    def ln(self, name: str):
        return {"scale": self.get(f"{name}.weight"),
                "bias": self.get(f"{name}.bias")}

    def conv(self, name: str):
        w = self.get(f"{name}.weight")          # (out, in, kh, kw)
        p = {"w": np.transpose(w, (2, 3, 1, 0))}
        if self.has(f"{name}.bias"):
            p["b"] = self.get(f"{name}.bias")
        return p

    def mln(self, name: str):
        return {
            "reduce": self.linear(f"{name}.reduce.0"),
            "gamma": self.linear(f"{name}.gamma"),
            "beta": self.linear(f"{name}.beta"),
        }

    def mha(self, name: str):
        """torch nn.MultiheadAttention packed in_proj -> split q/k/v."""
        w = self.get(f"{name}.in_proj_weight")   # (3C, C)
        b = self.get(f"{name}.in_proj_bias")
        c = w.shape[1]
        return {
            "q_proj": {"w": w[:c].T, "b": b[:c]},
            "k_proj": {"w": w[c:2 * c].T, "b": b[c:2 * c]},
            "v_proj": {"w": w[2 * c:].T, "b": b[2 * c:]},
            "out_proj": self.linear(f"{name}.out_proj"),
        }


# ---------------------------------------------------------------------------
# per-module converters
# ---------------------------------------------------------------------------

def convert_eva_block(sd: _SD):
    return {
        "norm1": sd.ln("norm1"),
        "attn": {
            "q_proj": {"w": sd.get("attn.q_proj.weight", True),
                       "b": sd.get("attn.q_bias")},
            "k_proj": {"w": sd.get("attn.k_proj.weight", True)},
            "v_proj": {"w": sd.get("attn.v_proj.weight", True),
                       "b": sd.get("attn.v_bias")},
            "proj": sd.linear("attn.proj"),
        },
        "norm2": sd.ln("norm2"),
        "mlp": {
            "w1": sd.linear("mlp.w1"),
            "w2": sd.linear("mlp.w2"),
            "w3": sd.linear("mlp.w3"),
            "ffn_ln": sd.ln("mlp.ffn_ln"),
        },
    }


def convert_selector(sd: _SD, score_type="attention"):
    p = {
        "score_mlp": {
            "in_ln": sd.ln("in_conv.0"),
            "in_fc": sd.linear("in_conv.1"),
            "out_fc0": sd.linear("out_conv.0"),
            "out_fc1": sd.linear("out_conv.2"),
            "out_fc2": sd.linear("out_conv.4"),
        },
        "input_proj": sd.linear("input_proj.0"),
        "query_embedding": {"fc0": sd.linear("query_embedding.0"),
                            "fc1": sd.linear("query_embedding.2")},
        "ego_pose_pe": sd.mln("ego_pose_pe"),
        "ego_pose_queries": sd.mln("ego_pose_queries"),
        "time_embedding": {"fc": sd.linear("time_embedding.0"),
                           "ln": sd.ln("time_embedding.1")},
    }
    if score_type == "attention":
        p["aggregate"] = sd.linear("aggregate.0")
    else:
        p["aggregate"] = {"lin1": sd.linear("aggregate.0.lin1"),
                          "lin2": sd.linear("aggregate.0.lin2")}
    return p


def convert_backbone(sd: _SD, depth: int, num_selectors: int = 0,
                     score_type="attention"):
    p = {
        "patch_embed": sd.conv("patch_embed.proj"),
        "blocks": [convert_eva_block(sd.sub(f"blocks.{i}"))
                   for i in range(depth)],
    }
    if sd.has("pos_embed"):
        p["pos_embed"] = sd.get("pos_embed")
    if num_selectors:
        p["score_predictor"] = [
            convert_selector(sd.sub(f"score_predictor.{i}"), score_type)
            for i in range(num_selectors)]
    return p


def convert_neck(sd: _SD):
    return {"lateral0": sd.conv("lateral_convs.0.conv"),
            "fpn0": sd.conv("fpn_convs.0.conv")}


def convert_focal_head(sd: _SD):
    def gn(name):
        return {"scale": sd.get(f"{name}.weight"),
                "bias": sd.get(f"{name}.bias")}

    return {
        "shared_cls_conv": sd.conv("shared_cls.0"),
        "shared_cls_gn": gn("shared_cls.1"),
        "shared_reg_conv": sd.conv("shared_reg.0"),
        "shared_reg_gn": gn("shared_reg.1"),
        "cls": sd.conv("cls"),
        "centerness": sd.conv("centerness"),
        "ltrb": sd.conv("ltrb"),
        "center2d": sd.conv("center2d"),
    }


def convert_decoder_layer(sd: _SD):
    return {
        "self_attn": sd.mha("attentions.0.attn"),
        "cross_attn": sd.mha("attentions.1.attn"),
        "ffn": {"fc0": sd.linear("ffns.0.layers.0.0"),
                "fc1": sd.linear("ffns.0.layers.1")},
        "norm0": sd.ln("norms.0"),
        "norm1": sd.ln("norms.1"),
        "norm2": sd.ln("norms.2"),
    }


def convert_head(sd: _SD, num_layers: int = 6, with_ego_pos=True,
                 num_propagated=256):
    p = {
        "position_encoder": {"fc0": sd.linear("position_encoder.0"),
                             "fc1": sd.linear("position_encoder.2")},
        "memory_embed": {"fc0": sd.linear("memory_embed.0"),
                         "fc1": sd.linear("memory_embed.2")},
        "featurized_pe": {
            "conv_reduce": sd.linear("featurized_pe.conv_reduce"),
            "conv_expand": sd.linear("featurized_pe.conv_expand"),
        },
        "reference_points": sd.get("reference_points.weight"),
        "query_embedding": {"fc0": sd.linear("query_embedding.0"),
                            "fc1": sd.linear("query_embedding.2")},
        "spatial_alignment": sd.mln("spatial_alignment"),
        "time_embedding": {"fc": sd.linear("time_embedding.0"),
                           "ln": sd.ln("time_embedding.1")},
        "decoder": {
            "layers": [convert_decoder_layer(
                sd.sub(f"transformer.decoder.layers.{i}"))
                for i in range(num_layers)],
            "post_norm": sd.ln("transformer.decoder.post_norm"),
        },
        # branches are shared across layers; index 0 is canonical
        "cls_branch": {
            "fc0": sd.linear("cls_branches.0.0"),
            "ln0": sd.ln("cls_branches.0.1"),
            "fc1": sd.linear("cls_branches.0.3"),
            "ln1": sd.ln("cls_branches.0.4"),
            "out": sd.linear("cls_branches.0.6"),
        },
        "reg_branch": {
            "fc0": sd.linear("reg_branches.0.0"),
            "fc1": sd.linear("reg_branches.0.2"),
            "out": sd.linear("reg_branches.0.4"),
        },
    }
    if num_propagated > 0:
        p["pseudo_reference_points"] = sd.get(
            "pseudo_reference_points.weight")
    if with_ego_pos:
        p["ego_pose_pe"] = sd.mln("ego_pose_pe")
        p["ego_pose_memory"] = sd.mln("ego_pose_memory")
    return p


def convert_detector_checkpoint(state_dict: Dict[str, np.ndarray], cfg):
    """Full reference checkpoint -> detector param pytree.

    cfg: DetectorConfig (for depth / selector count / layer count).
    """
    sd = _SD(state_dict)
    backbone = cfg.backbone
    n_sel = len(getattr(backbone, "pruning_loc", ()) or ())
    params = {
        "img_backbone": convert_backbone(
            sd.sub("img_backbone"), backbone.depth, n_sel,
            getattr(backbone, "pruning_score_type", "attention")),
        "img_neck": convert_neck(sd.sub("img_neck")),
        "pts_bbox_head": convert_head(
            sd.sub("pts_bbox_head"), cfg.head.decoder.num_layers,
            cfg.head.with_ego_pos, cfg.head.num_propagated),
    }
    if any(k.startswith("img_roi_head.") for k in state_dict):
        params["img_roi_head"] = convert_focal_head(sd.sub("img_roi_head"))
    unused = {k for k in state_dict if k not in sd.used
              and not _is_buffer(k)}
    if unused:
        import warnings
        warnings.warn(f"{len(unused)} unconverted checkpoint keys, e.g. "
                      f"{sorted(unused)[:5]}")
    import jax.numpy as jnp
    return _to_jnp(params)


_BUFFER_PAT = re.compile(
    r"(rope_|freqs_|code_weights|match_costs|pc_range|position_range|"
    r"coords_d|cls_branches\.[1-9]|reg_branches\.[1-9])")


def _is_buffer(key: str) -> bool:
    return bool(_BUFFER_PAT.search(key))


def _to_jnp(tree):
    import jax.numpy as jnp

    if isinstance(tree, dict):
        return {k: _to_jnp(v) for k, v in tree.items()}
    if isinstance(tree, list):
        return [_to_jnp(v) for v in tree]
    return jnp.asarray(tree)


# ---------------------------------------------------------------------------
# public pretrained backbone warm-start (EVA-02 / SAM / MAE / ViTDet)
# ---------------------------------------------------------------------------

# prefix rewrites from the reference's warm-start shims (tools/train.py:
# 260-340): SAM image_encoder, ViTDet backbone.net, MAE bare keys, V99 neck.
PRETRAINED_PREFIX_REWRITES = (
    ("image_encoder.", "img_backbone."),
    ("backbone.net.", "img_backbone."),
    ("module.", ""),
)


def load_backbone_pretrained(params, state_dict: Dict[str, np.ndarray],
                             depth: int):
    """Merge a public backbone checkpoint (EVA-02/SAM/MAE naming) into
    randomly-initialized detector params, non-strict: anything convertible
    is taken, the rest (selectors, heads, missing blocks) keeps its init.

    Returns (params, report dict with 'loaded'/'missing' key lists).
    """
    import jax.numpy as jnp

    sd_flat = {}
    for k, v in state_dict.items():
        for old, new in PRETRAINED_PREFIX_REWRITES:
            if k.startswith(old):
                k = new + k[len(old):]
        if not k.startswith("img_backbone."):
            k = "img_backbone." + k     # MAE checkpoints use bare keys
        sd_flat[k] = _np(v)

    sd = _SD(sd_flat).sub("img_backbone")
    backbone = dict(params["img_backbone"])
    loaded, missing = [], []

    if sd.has("pos_embed"):
        backbone["pos_embed"] = jnp.asarray(sd.get("pos_embed"))
        loaded.append("pos_embed")
    try:
        backbone["patch_embed"] = _to_jnp(sd.conv("patch_embed.proj"))
        loaded.append("patch_embed")
    except KeyError:
        missing.append("patch_embed")

    blocks = list(backbone["blocks"])
    for i in range(depth):
        try:
            blocks[i] = _to_jnp(convert_eva_block(sd.sub(f"blocks.{i}")))
            loaded.append(f"blocks.{i}")
        except KeyError:
            missing.append(f"blocks.{i}")
    backbone["blocks"] = blocks

    params = dict(params)
    params["img_backbone"] = backbone
    return params, {"loaded": loaded, "missing": missing}


# ---------------------------------------------------------------------------
# orbax save / load
# ---------------------------------------------------------------------------

def save_params(params, path: str):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, params, force=True)
    ckptr.wait_until_finished()


def load_params(path: str, like=None):
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)


def save_train_state(state, path: str):
    """Full TrainState (params + optimizer state + memory bank + step) for
    --resume-from (reference mmcv CheckpointHook + runner.resume,
    mmdet_train.py:200-206)."""
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.device_get(state._asdict()), force=True)
    ckptr.wait_until_finished()


def load_train_state(path: str, like_state):
    import jax
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    like = jax.tree_util.tree_map(lambda x: x, like_state._asdict())
    restored = ckptr.restore(path, like)
    return type(like_state)(**restored)
