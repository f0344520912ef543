"""Petr3D detector orchestration — streaming multi-view temporal 3D detection
as one jit-compiled step over explicit state.

Capability parity target: reference
  projects/mmdet3d_plugin/models/detectors/petr3d.py (Petr3D).

The reference mutates module attributes (head memory bank, prev scene token)
across frames; here the whole inter-frame state is a DetectorState pytree
threaded through `infer_step`, so streaming eval is
  state, boxes = jit(infer_step)(params, state, frame)
with zero host round-trips inside a scene.

Cross-module feedback (backbone token selection reads the head's memory
bank, petr3d.py:117-143) becomes an explicit read of state.memory before the
backbone call, stop-gradiented like the reference's .detach().
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import NamedTuple, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .eva_vit import EVAViTConfig, init_eva_vit, eva_vit_forward, make_rope_tables
from .toc3d_vit import ToC3DViTConfig, init_toc3d_vit, toc3d_vit_forward
from .neck import CPFPNConfig, init_cpfpn, cpfpn_forward
from .focal_head import FocalHeadConfig, init_focal_head, focal_head_forward
from .streampetr_head import (StreamPETRHeadConfig, MemoryBank, init_memory,
                              init_streampetr_head, head_forward,
                              location_grid)
from ..core.coder import nms_free_decode, to_bottom_center, DecodedBoxes


@dataclass(frozen=True)
class DetectorConfig:
    backbone: EVAViTConfig = field(default_factory=ToC3DViTConfig)
    neck: CPFPNConfig = field(default_factory=CPFPNConfig)
    head: StreamPETRHeadConfig = field(default_factory=StreamPETRHeadConfig)
    focal: FocalHeadConfig = field(default_factory=FocalHeadConfig)
    use_grid_mask: bool = True
    aux_2d_only: bool = True
    stride: int = 16
    position_level: int = 0
    num_frame_backbone_grads: int = 1
    num_frame_head_grads: int = 1
    num_frame_losses: int = 1
    # padded input image size (static): (pad_h, pad_w)
    pad_shape: Tuple[int, int] = (320, 800)
    compute_dtype: str = "float32"   # 'float32' | 'bfloat16'

    @property
    def is_toc3d(self) -> bool:
        return isinstance(self.backbone, ToC3DViTConfig) and bool(
            self.backbone.pruning_loc)


class DetectorState(NamedTuple):
    """All inter-frame state of the streaming detector."""
    memory: MemoryBank


def init_detector(key, cfg: DetectorConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if isinstance(cfg.backbone, ToC3DViTConfig):
        backbone = init_toc3d_vit(k1, cfg.backbone)
    else:
        backbone = init_eva_vit(k1, cfg.backbone)
    return {
        "img_backbone": backbone,
        "img_neck": init_cpfpn(k2, cfg.neck),
        "img_roi_head": init_focal_head(k3, cfg.focal),
        "pts_bbox_head": init_streampetr_head(k4, cfg.head),
    }


def init_state(batch_size: int, cfg: DetectorConfig) -> DetectorState:
    return DetectorState(memory=init_memory(batch_size, cfg.head))


# ---------------------------------------------------------------------------
# feature extraction
# ---------------------------------------------------------------------------

def _motion_ctx_from_memory(cfg: DetectorConfig, memory: MemoryBank, frame):
    """First pruning_num_queries memory slots, detached — the backbone
    selector's guidance (petr3d.py:117-143)."""
    nq = cfg.backbone.pruning_num_queries
    sg = jax.lax.stop_gradient
    return {
        "temp_queries": sg(memory.embedding[:, :nq]),
        "temp_ref_points": sg(memory.reference_point[:, :nq]),
        "temp_vel": sg(memory.velo[:, :nq]),
        "temp_timestamp": sg(memory.timestamp[:, :nq]),
        "temp_ego_pose": sg(memory.egopose[:, :nq]),
        "ego_pose_inv": frame["ego_pose_inv"],
    }


def extract_img_feat(params, cfg: DetectorConfig, img, memory: MemoryBank,
                     frame, rope_tables=None, rng=None, remat=False,
                     mask_rng=None, fused_ok: bool = True,
                     collect_block_outs: bool = False, injected=None,
                     view_scan: Union[bool, int] = False,
                     attn_chunk: Optional[int] = None):
    """img: (B, N, H, W, 3) images -> (feats (B, N, h, w, C), aux).

    img is either float32 already mean/std-normalized on the host, or raw
    uint8 BGR (loader device_normalize path) — uint8 is normalized here,
    inside the jitted program, where (x-mean)/std fuses into the first
    backbone op for free and the host->device transfer is 4x smaller.
    Same math as data/nuscenes.normalize_image (f32, then compute-dtype
    cast), so the two payloads produce identical features.

    aux carries the token-compression masks/indices for loss and vis.
    mask_rng: eval-only PRNG for the reference-parity stochastic token mask
    (ToC3DViTConfig.eval_mask='gumbel').
    fused_ok: the train step passes False — Pallas kernels compiled into
    the single differentiated train program kernel-fault the axon TPU
    worker (eva_vit.block_forward docstring); inference keeps them.

    view_scan: run the backbone as a lax.scan over the N camera views
    instead of one batched (B*N)-row pass. The backbone never mixes
    views (window/global attention and the token selector are all
    per-row; cross-view interaction happens only in the head), so this
    is the same function with sequentialized lifetimes: peak HBM for the
    training backward drops ~N-fold (param grads accumulate through the
    scan transpose). Used by the train step at 1600x800, where the
    unscanned fwd+bwd needs 19.6 GB of HLO temps vs the chip's 15.75 GB
    (block backwards' lifetimes overlap across layers). An int value
    scans CHUNKS of that many views per step (must divide N) — fewer
    scan steps keep the batched-window matmuls larger while still
    bounding temps; True == 1. Per-chunk RNG keys are fold_in-split, so
    selector-noise/droppath draws differ from the unscanned path's
    single batched draw — same distribution, not bit-identical.
    Incompatible with the two-program split's collect/inject machinery
    (whole-(B*N) site outputs).
    attn_chunk: bounded-memory train-time attention (ops.attention
    _sdpa_chunked) — caps every block's transient f32 probs at
    attn_chunk windows; makes the UNSCANNED 1600x800 train step fit.
    """
    b, n, h, w, c = img.shape
    x = img.reshape(b * n, h, w, c)
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    if x.dtype == jnp.uint8:
        from ..configs.presets import IMG_NORM_MEAN, IMG_NORM_STD
        mean = jnp.asarray(IMG_NORM_MEAN, jnp.float32)
        std = jnp.asarray(IMG_NORM_STD, jnp.float32)
        x = (x.astype(jnp.float32) - mean) / std
    x = x.astype(dtype)

    aux = None
    collected = None
    if view_scan:
        if collect_block_outs or injected is not None:
            raise NotImplementedError(
                "view_scan is incompatible with the two-program split's "
                "collect/inject machinery (per-site outputs are whole-(B*N))")
        motion_ctx = (_motion_ctx_from_memory(cfg, memory, frame)
                      if cfg.is_toc3d else None)
        cs = 1 if view_scan is True else int(view_scan)
        if n % cs != 0:
            raise ValueError(
                f"view_scan chunk {cs} must divide the view count {n}")
        nc = n // cs
        # chunk packing stays b-major within each chunk — the selector
        # broadcasts B-leading motion queries over bn//b contiguous rows
        xs = (x.reshape(b, nc, cs, h, w, -1)
              .transpose(1, 0, 2, 3, 4, 5)
              .reshape(nc, b * cs, h, w, -1))
        rngs = None if rng is None else jax.random.split(rng, nc)
        mrngs = None if mask_rng is None else jax.random.split(mask_rng, nc)

        def one_chunk(xv, kv, mkv):
            if cfg.is_toc3d:
                return toc3d_vit_forward(
                    params["img_backbone"], xv, cfg.backbone, motion_ctx,
                    frame["prev_exists"], rope_tables=rope_tables, rng=kv,
                    remat=remat, mask_rng=mkv, fused_ok=fused_ok,
                    attn_chunk=attn_chunk)
            return eva_vit_forward(params["img_backbone"], xv, cfg.backbone,
                                   rope_tables=rope_tables, remat=remat,
                                   rng=kv, fused_ok=fused_ok,
                                   attn_chunk=attn_chunk), None

        def body(carry, inp):
            xv = inp[0]
            rest = inp[1:]
            kv = mkv = None
            if rngs is not None:
                kv, rest = rest[0], rest[1:]
            if mrngs is not None:
                mkv = rest[0]
            return carry, one_chunk(xv, kv, mkv)

        ins = ((xs,) + (() if rngs is None else (rngs,))
               + (() if mrngs is None else (mrngs,)))
        _, (feats_s, aux_s) = jax.lax.scan(body, None, ins)
        # scan stacks chunk-major (NC, B*cs, ...); downstream is b-major

        def unstack(a):
            a = a.reshape((nc, b, cs) + a.shape[2:])
            a = jnp.moveaxis(a, 1, 0)            # (B, NC, cs, ...)
            return a.reshape((b * n,) + a.shape[3:])

        feats = unstack(feats_s)
        aux = jax.tree_util.tree_map(unstack, aux_s)
    elif cfg.is_toc3d:
        motion_ctx = _motion_ctx_from_memory(cfg, memory, frame)
        out = toc3d_vit_forward(
            params["img_backbone"], x, cfg.backbone, motion_ctx,
            frame["prev_exists"], rope_tables=rope_tables, rng=rng,
            remat=remat, mask_rng=mask_rng, fused_ok=fused_ok,
            collect_block_outs=collect_block_outs, injected=injected,
            attn_chunk=attn_chunk)
        if collect_block_outs:
            feats, aux, collected = out
        else:
            feats, aux = out
    else:
        if collect_block_outs or injected is not None:
            raise NotImplementedError(
                "the two-program training split (collect/inject) targets "
                "the ToC3D backbone; plain EVA trains via the XLA path")
        feats = eva_vit_forward(params["img_backbone"], x, cfg.backbone,
                                rope_tables=rope_tables, remat=remat,
                                rng=rng, fused_ok=fused_ok,
                                attn_chunk=attn_chunk)

    outs = cpfpn_forward(params["img_neck"], feats, cfg.neck)
    f = outs[cfg.position_level]
    fh, fw = f.shape[1], f.shape[2]
    f = f.reshape(b, n, fh, fw, -1).astype(jnp.float32)
    if collect_block_outs:
        return f, aux, collected
    return f, aux


# ---------------------------------------------------------------------------
# streaming inference step
# ---------------------------------------------------------------------------

def infer_step(params, cfg: DetectorConfig, state: DetectorState, frame,
               rope_tables=None):
    """(params, state, frame) -> (state', DecodedBoxes).

    frame dict (all B-leading):
      img (B, N, H, W, 3) normalized+padded; intrinsics (B, N, 4, 4);
      img2lidar (B, N, 4, 4); timestamp (B,) relative seconds;
      ego_pose / ego_pose_inv (B, 4, 4); prev_exists (B,) float {0,1}.
    """
    feats, aux = extract_img_feat(params, cfg, frame["img"], state.memory,
                                  frame)

    data = {
        "intrinsics": frame["intrinsics"],
        "img2lidar": frame["img2lidar"],
        "timestamp": frame["timestamp"],
        "ego_pose": frame["ego_pose"],
        "ego_pose_inv": frame["ego_pose_inv"],
        "prev_exists": frame["prev_exists"],
        "pad_shape": cfg.pad_shape,
    }
    # aux_2d_only=True -> no focal sampling at inference (petr3d.py:319-320)
    outs, new_memory = head_forward(params["pts_bbox_head"], cfg.head, feats,
                                    data, state.memory, topk_indexes=None)

    decoded = nms_free_decode(outs["all_cls_scores"], outs["all_bbox_preds"],
                              cfg.head.num_classes, cfg.head.max_decode,
                              cfg.head.post_center_range)
    decoded = decoded._replace(bboxes=to_bottom_center(decoded.bboxes))
    return DetectorState(memory=new_memory), decoded


def head_step(params, cfg: DetectorConfig, state: DetectorState, feats,
              frame):
    """Head + decode given precomputed neck features (second phase of the
    two-program streaming step, see make_infer_fn)."""
    data = {k: frame[k] for k in ("intrinsics", "img2lidar", "timestamp",
                                  "ego_pose", "ego_pose_inv", "prev_exists")}
    data["pad_shape"] = cfg.pad_shape
    outs, new_memory = head_forward(params["pts_bbox_head"], cfg.head, feats,
                                    data, state.memory, topk_indexes=None)
    decoded = nms_free_decode(outs["all_cls_scores"], outs["all_bbox_preds"],
                              cfg.head.num_classes, cfg.head.max_decode,
                              cfg.head.post_center_range)
    decoded = decoded._replace(bboxes=to_bottom_center(decoded.bboxes))
    return DetectorState(memory=new_memory), decoded


def _precast_backbone_params(params, cfg: DetectorConfig):
    """Cast the backbone's weight MATRICES (ndim >= 2, excluding pos_embed)
    to the compute dtype once, outside the streaming program.

    The block kernels cast weights to the activation dtype in-graph
    (vit_block._flatten_params); with f32-stored params that cast re-runs
    every frame — ~1.8 GB/frame of HBM traffic at ViT-L (610 MB of bf16
    writes + 1.2 GB of f32 reads + operand copies), ~2.5 ms. Pre-cast
    params make those casts no-ops that XLA elides. Biases and LN params
    stay f32 (the kernels want them f32); pos_embed stays f32 (bicubic
    resize math). The cast here is the SAME f32->bf16 rounding the
    in-graph cast performed, so kernel inputs are bit-identical."""
    def cast(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if (hasattr(a, "ndim") and a.ndim >= 2
                and a.dtype == jnp.float32) else a, tree)

    bb = dict(params["img_backbone"])
    if cfg.compute_dtype == "bfloat16":
        for k in ("blocks", "patch_embed", "score_predictor"):
            if k in bb:
                bb[k] = cast(bb[k])
    if getattr(cfg.backbone, "quant", "none") == "int8":
        # serving int8: per-output-channel weight quantization of every
        # block's seven weight matmuls, done here ONCE so the streaming
        # program only reads int8 weights + f32 scale rows (the in-kernel
        # activation quantization is dynamic per row). Only meaningful with
        # the fused kernels — the XLA block path raises on quantized params.
        from ..ops.pallas.vit_block import quantize_block_params
        # act_scales: calibrated static activation scales, attached to the
        # params tree by ops.int8_calib.attach_act_scales. With them the
        # kernels quantize activations at fixed per-site scales instead of
        # per-row dynamic amax (r3 #6c static calibration).
        scales = bb.pop("act_scales", None)
        bb["blocks"] = [quantize_block_params(
                            blk, cfg.backbone.num_heads,
                            act_scales=None if scales is None else scales[i])
                        for i, blk in enumerate(bb["blocks"])]
    out = dict(params)
    out["img_backbone"] = bb
    if getattr(cfg.head.decoder, "quant", "none") == "int8":
        # serving int8 for the head decoder's linears (XLA int8 dots,
        # petr_transformer.quantize_decoder_params); attention cores and
        # cls/reg branches stay in the decoder compute dtype.
        from .petr_transformer import quantize_decoder_params
        head = dict(out["pts_bbox_head"])
        head["decoder"] = quantize_decoder_params(head["decoder"])
        out["pts_bbox_head"] = head
    return out


class PrecastCache:
    """One-entry params→precast cache keyed on pytree-leaf identity.

    `id(params)` alone is unsafe: after the old pytree is GC'd a new one can
    reuse the id and silently serve stale precast weights. Holding the leaf
    arrays alive and comparing with `is` removes the hazard — a live
    object's identity can't be recycled. EVERY leaf is compared (ADVICE r4):
    a partially-rebuilt tree can share its first leaf with the old one
    (e.g. {**params, 'pts_bbox_head': new_head} after a head-only reload)
    and must not be served the stale precast. The `is`-sweep over ~1k leaf
    references is nanoseconds next to the jitted precast it guards."""

    def __init__(self, fn):
        self._fn = fn
        self._leaves = None
        self._value = None

    def __call__(self, params):
        leaves = jax.tree_util.tree_leaves(params)
        if (self._leaves is None or len(leaves) != len(self._leaves)
                or any(a is not b for a, b in zip(leaves, self._leaves))):
            self._value = self._fn(params)
            self._leaves = leaves
        return self._value


def make_infer_fn(cfg: DetectorConfig, mask_seed: int = 0):
    """Build the streaming inference callable as TWO jitted programs
    (backbone+neck, then head+decode).

    A single fused program kernel-faults on TPU v5e at 1600x800 when the
    bf16 backbone and fp32 head are compiled into one module (XLA:TPU bug,
    jax 0.9 via axon; fp32-everything fuses fine, and each half alone is
    fine). The two-program split matches the reference's own timer
    granularity (backbone / neck / 3D transformer) and costs only one extra
    dispatch per frame.

    mask_seed: when cfg.backbone.eval_mask == 'gumbel' (reference strict
    parity — stochastic eval token mask, toc3d_utils.py:146-147), a per-frame
    PRNG folded from this seed is threaded into the backbone.
    """
    stochastic = (getattr(cfg.backbone, "eval_mask", "softmax") == "gumbel")
    if stochastic:
        ex = jax.jit(lambda p, img, mem, f, k: extract_img_feat(
            p, cfg, img, mem, f, mask_rng=k)[0])
    else:
        ex = jax.jit(lambda p, img, mem, f: extract_img_feat(
            p, cfg, img, mem, f)[0])
    hd = jax.jit(lambda p, s, feats, f: head_step(p, cfg, s, feats, f))
    base = jax.random.PRNGKey(mask_seed)
    counter = [0]
    precast = PrecastCache(jax.jit(lambda p: _precast_backbone_params(p, cfg)))

    def infer(params, state: DetectorState, frame):
        p = precast(params)
        if stochastic:
            k = jax.random.fold_in(base, counter[0])
            counter[0] += 1
            feats = ex(p, frame["img"], state.memory, frame, k)
        else:
            feats = ex(p, frame["img"], state.memory, frame)
        return hd(p, state, feats, frame)

    return infer


def infer_step_with_aux(params, cfg: DetectorConfig, state: DetectorState,
                        frame):
    """infer_step variant that also returns token-selection aux (for the
    token visualizer, petr3d.py:562-579)."""
    feats, aux = extract_img_feat(params, cfg, frame["img"], state.memory,
                                  frame)
    data = {k: frame[k] for k in ("intrinsics", "img2lidar", "timestamp",
                                  "ego_pose", "ego_pose_inv", "prev_exists")}
    data["pad_shape"] = cfg.pad_shape
    outs, new_memory = head_forward(params["pts_bbox_head"], cfg.head, feats,
                                    data, state.memory, topk_indexes=None)
    decoded = nms_free_decode(outs["all_cls_scores"], outs["all_bbox_preds"],
                              cfg.head.num_classes, cfg.head.max_decode,
                              cfg.head.post_center_range)
    decoded = decoded._replace(bboxes=to_bottom_center(decoded.bboxes))
    return DetectorState(memory=new_memory), decoded, aux
