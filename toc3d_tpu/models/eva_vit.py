"""EVA-02 ViT backbone (baseline, no token compression) — TPU-native.

Capability parity target: reference
  projects/mmdet3d_plugin/models/backbones/eva_vit.py (EVA_ViT, Block,
  Attention, SwiGLU) and eva_utils.py (PatchEmbed, get_abs_pos, RoPE).

Design notes (TPU-first, not a port):
  * Pure functions over a param pytree; per-block remat is applied by the
    training step (jax.checkpoint), not baked in here.
  * Window partition/unpartition are static-shape reshapes; all 24 blocks run
    as an unrolled python loop (24 is static) so XLA can fuse freely.
  * RoPE cos/sin tables are host-precomputed constants per (window, global).
  * LayerNorm eps 1e-6 (norm_layer=partial(nn.LayerNorm, eps=1e-6) in ref).
"""
from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..layers import (init_conv, conv2d, init_layer_norm, layer_norm,
                      init_swiglu, swiglu, trunc_normal)
from ..ops.attention import init_eva_attention, eva_attention
from ..ops.resize import resize_abs_pos
from ..ops.rope import build_rope_table
from ..ops.window import window_partition, window_unpartition

LN_EPS = 1e-6


@dataclass(frozen=True)
class EVAViTConfig:
    """Mirrors the reference's public config knobs (ToC3D_fast.py:41-69)."""
    img_size: int = 320              # short side; sets the global RoPE grid
    patch_size: int = 16
    in_chans: int = 3
    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    mlp_ratio: float = 4 * 2 / 3
    window_size: int = 16
    global_window_size: int = 20
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11, 14, 17, 20, 23)
    use_abs_pos: bool = True
    rope: bool = True
    pt_hw_seq_len: int = 16
    intp_freq: bool = True
    pretrain_img_size: int = 224
    pretrain_use_cls_token: bool = True
    drop_path_rate: float = 0.0      # eval path ignores droppath (identity)
    # fuse each whole transformer block (LN/QKV/RoPE/attn/proj/SwiGLU) into
    # one Pallas megakernel (ops/pallas/vit_block.py) — inference on TPU
    # only; CPU and training (rng given) keep the XLA path
    fused_blocks: bool = False
    # 'int8': serving-only dynamic-activation int8 path inside the fused
    # kernels (weights per-output-channel int8, activations per-row; v5e MXU
    # int8 is ~1.76x the bf16 rate at these shapes). Quantization happens
    # once in detector._precast_backbone_params; requires fused_blocks.
    # Experimental: accuracy vs the bf16 path is bounded by tests on synthetic
    # weights but unvalidated against released checkpoints (no data on image).
    quant: str = "none"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def hw_seq_len(self) -> int:
        return self.img_size // self.patch_size


def vit_b_config(**kw) -> EVAViTConfig:
    return EVAViTConfig(embed_dim=768, depth=12, num_heads=12,
                        global_attn_indexes=(2, 5, 8, 11), **kw)


def make_rope_tables(cfg: EVAViTConfig):
    """(window_tables, global_tables) each (cos, sin) or None."""
    if not cfg.rope:
        return None, None
    half = cfg.head_dim // 2
    win = build_rope_table(half, cfg.pt_hw_seq_len,
                           cfg.window_size if cfg.intp_freq else None)
    glb = build_rope_table(half, cfg.pt_hw_seq_len,
                           cfg.hw_seq_len if cfg.intp_freq else None)
    return win, glb


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_block(key, cfg: EVAViTConfig):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    return {
        "norm1": init_layer_norm(cfg.embed_dim),
        "attn": init_eva_attention(k1, cfg.embed_dim, cfg.num_heads),
        "norm2": init_layer_norm(cfg.embed_dim),
        "mlp": init_swiglu(k2, cfg.embed_dim,
                           int(cfg.embed_dim * cfg.mlp_ratio), subln=True),
    }


def init_eva_vit(key, cfg: EVAViTConfig):
    keys = jax.random.split(key, cfg.depth + 2)
    params = {
        "patch_embed": init_conv(keys[0], cfg.patch_size, cfg.patch_size,
                                 cfg.in_chans, cfg.embed_dim),
        "blocks": [init_block(keys[i + 2], cfg) for i in range(cfg.depth)],
    }
    if cfg.use_abs_pos:
        n = (cfg.pretrain_img_size // cfg.patch_size) ** 2
        n = n + 1 if cfg.pretrain_use_cls_token else n
        params["pos_embed"] = trunc_normal(keys[1], (1, n, cfg.embed_dim), 0.02)
    return params


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _patch_embed_conv(p, x, patch_size: int):
    return conv2d(p, x, stride=patch_size, padding="VALID")


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _patch_embed_fused(p, x, patch_size: int):
    from ..ops.pallas.patch_embed import patchify_matmul
    return patchify_matmul(x, p["w"], p["b"], patch_size)


def _pe_fwd(p, x, patch_size):
    return _patch_embed_fused(p, x, patch_size), (p, x)


def _pe_bwd(patch_size, res, g):
    p, x = res
    _, vjp = jax.vjp(lambda pp, xx: _patch_embed_conv(pp, xx, patch_size),
                     p, x)
    return vjp(g)


_patch_embed_fused.defvjp(_pe_fwd, _pe_bwd)


def patch_embed(p, x, patch_size: int, fused_ok: bool = True):
    """x: (B, H, W, 3) -> (B, H/ps, W/ps, C).

    fused_ok: False inside the train program — the kernel's custom call
    kernel-faults the axon TPU worker when compiled into the single
    differentiated train program (see block_forward); the conv path is
    used there instead.

    Off-CPU this runs the Pallas patchify-as-matmul kernel
    (ops/pallas/patch_embed.py): XLA's conv fusion for a 3-channel 16x16
    stride-16 conv runs at ~10 TFLOP/s and drags a full-image layout copy
    with it (~7 ms/frame at 1600x800 vs ~1 ms fused). A pure-XLA
    reshape+matmul variant was also tried and is WORSE than the conv (the
    (B, h, ps, w, ps, 3) transpose costs ~125 ms; without the conv XLA also
    picks a bad input layout). CPU keeps the conv (interpret mode crawls);
    tests force the kernel via ops.pallas.patch_embed.FORCE_FUSED_ON_CPU.
    """
    assert x.shape[1] % patch_size == 0 and x.shape[2] % patch_size == 0, (
        f"image size {x.shape[1:3]} must be a multiple of patch_size="
        f"{patch_size}; pad inputs (PadMultiViewImage pads to /32)")
    from ..ops.pallas import patch_embed as _pe
    if (fused_ok and "b" in p and x.shape[-1] == 3
            and (jax.default_backend() != "cpu" or _pe.FORCE_FUSED_ON_CPU)):
        return _patch_embed_fused(p, x, patch_size)
    return _patch_embed_conv(p, x, patch_size)


def init_res_bottleneck(key, dim: int):
    """ResBottleneckBlock params (eva_vit.py:122-180): 1x1 -> 3x3 -> 1x1
    convs with LN, last norm zero-initialized."""
    k = jax.random.split(key, 3)
    bc = dim // 2
    p = {
        "conv1": init_conv(k[0], 1, 1, dim, bc, bias=False),
        "norm1": init_layer_norm(bc),
        "conv2": init_conv(k[1], 3, 3, bc, bc, bias=False),
        "norm2": init_layer_norm(bc),
        "conv3": init_conv(k[2], 1, 1, bc, dim, bias=False),
        "norm3": {"scale": jnp.zeros((dim,)), "bias": jnp.zeros((dim,))},
    }
    return p


def res_bottleneck(p, x):
    """x: (B, H, W, C) channel-last; detectron2 LN here normalizes over the
    channel dim."""
    out = conv2d(p["conv1"], x, padding="VALID")
    out = jax.nn.gelu(layer_norm(p["norm1"], out, eps=1e-6),
                      approximate=False)
    out = conv2d(p["conv2"], out, padding=[(1, 1), (1, 1)])
    out = jax.nn.gelu(layer_norm(p["norm2"], out, eps=1e-6),
                      approximate=False)
    out = conv2d(p["conv3"], out, padding="VALID")
    out = layer_norm(p["norm3"], out, eps=1e-6)
    return x + out


def get_vit_lr_decay_rate(name_path: str, lr_decay_rate: float = 1.0,
                          num_layers: int = 12) -> float:
    """Per-parameter layer-decay multiplier (eva_vit.py:574-591).

    name_path: '/'-joined param path, e.g.
    'img_backbone/blocks/17/attn/q_proj/w'."""
    layer_id = num_layers + 1
    if name_path.startswith("img_backbone"):
        if "pos_embed" in name_path or "patch_embed" in name_path:
            layer_id = 0
        elif "/blocks/" in name_path and "/residual/" not in name_path:
            layer_id = int(name_path.split("/blocks/")[1].split("/")[0]) + 1
    return lr_decay_rate ** (num_layers + 1 - layer_id)


def drop_path(rng, x, rate: float):
    """Stochastic depth on the residual delta (timm DropPath semantics:
    per-sample bernoulli, rescaled). Identity when rng is None or rate 0."""
    if rng is None or rate <= 0.0:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def block_forward(p, x, cfg: EVAViTConfig, window_size: int, rope_tables,
                  dp_rate: float = 0.0, rng=None, fused_ok: bool = True,
                  attn_chunk: Optional[int] = None):
    """Plain (non-compressed) EVA block. x: (B, H, W, C).

    dp_rate/rng: train-time stochastic depth (Block.forward drop_path,
    eva_vit.py:262-263; the reference skips drop_path in the accelerated
    slow path, toc3d_eva_vit.py:366-386, and so do we).
    attn_chunk: train-time bounded-memory attention (ops.attention
    _sdpa_chunked) — chunks the window-batch axis so the f32 probs never
    materialize whole.
    fused_ok: the train step passes False — Pallas custom calls inside the
    single differentiated train program kernel-fault the axon TPU worker
    (same XLA:TPU bug class as the documented bf16-backbone + fp32-head
    inference fault that forces detector.make_infer_fn's two-program
    split); training uses the XLA path, inference keeps the kernels."""
    if cfg.fused_blocks and fused_ok and jax.default_backend() != "cpu":
        if rng is None:
            from ..ops.pallas.vit_block import fused_full_block
            return fused_full_block(p, x, cfg.num_heads, window_size,
                                    rope_tables)
        if dp_rate <= 0.0:
            # training with no stochastic depth: kernel forward + exact
            # XLA backward (custom VJP). With droppath active the delta
            # masking lives inside the XLA body — keep the XLA path.
            # RoPE tables are explicit operands of the custom-VJP wrapper
            # (closure capture leaks tracers under train-step remat).
            from ..ops.pallas.vit_block import make_trainable_full_block
            xla_fn = lambda p_, x_, t_: _block_forward_xla(
                p_, x_, cfg, window_size, t_ if t_ else None, 0.0, None)
            return make_trainable_full_block(
                xla_fn, cfg.num_heads, window_size)(
                    p, x, tuple(rope_tables) if rope_tables else ())
    return _block_forward_xla(p, x, cfg, window_size, rope_tables, dp_rate,
                              rng, attn_chunk)


def _block_forward_xla(p, x, cfg: EVAViTConfig, window_size: int,
                       rope_tables, dp_rate: float = 0.0, rng=None,
                       attn_chunk: Optional[int] = None):
    if "w_scale" in p["attn"]["q_proj"]:
        raise ValueError(
            "int8-quantized block params reached the XLA block path — the "
            "int8 serving path lives in the fused kernels only "
            "(EVAViTConfig.quant='int8' requires fused_blocks on a TPU "
            "backend); re-init or keep the float params for this path")
    b, h, w, c = x.shape
    shortcut = x
    x = layer_norm(p["norm1"], x, eps=LN_EPS)
    xw, padded = window_partition(x, window_size)
    xw = eva_attention(p["attn"], xw, cfg.num_heads, rope_tables,
                       attn_chunk=attn_chunk)
    x = window_unpartition(xw, window_size, padded, (h, w))
    r1 = None if rng is None else jax.random.fold_in(rng, 0)
    r2 = None if rng is None else jax.random.fold_in(rng, 1)
    x = shortcut + drop_path(r1, x, dp_rate)
    x = x + drop_path(
        r2, swiglu(p["mlp"], layer_norm(p["norm2"], x, eps=LN_EPS),
                   ln_eps=LN_EPS), dp_rate)
    return x


def drop_path_rates(cfg: EVAViTConfig):
    """Linear stochastic-depth ramp (eva_vit.py:366)."""
    if cfg.depth == 1:
        return [0.0]
    return [cfg.drop_path_rate * i / (cfg.depth - 1)
            for i in range(cfg.depth)]


def eva_vit_forward(params, x, cfg: EVAViTConfig, rope_tables=None,
                    remat: bool = False, rng=None, fused_ok: bool = True,
                    attn_chunk: Optional[int] = None):
    """x: (B, H, W, 3) images (normalized) -> (B, h, w, C) features.

    rope_tables: optional precomputed (win, glb) pair from make_rope_tables.
    rng: enables train-time stochastic depth (drop_path_rate ramp).
    fused_ok: False inside the train program (see block_forward).
    attn_chunk: train-time bounded-memory attention (see block_forward).
    """
    if rope_tables is None:
        rope_tables = make_rope_tables(cfg)
    rope_win, rope_glb = rope_tables
    dprs = drop_path_rates(cfg)

    x = patch_embed(params["patch_embed"], x, cfg.patch_size,
                    fused_ok=fused_ok)
    if cfg.use_abs_pos:
        x = x + resize_abs_pos(params["pos_embed"], cfg.pretrain_use_cls_token,
                               (x.shape[1], x.shape[2])).astype(x.dtype)

    for i in range(cfg.depth):
        is_global = i in cfg.global_attn_indexes
        ws = cfg.global_window_size if is_global else cfg.window_size
        tables = rope_glb if is_global else rope_win
        brng = None if rng is None else jax.random.fold_in(rng, i)
        fwd = block_forward
        if remat:
            fwd = jax.checkpoint(block_forward,
                                 static_argnums=(2, 3, 5, 7, 8))
        x = fwd(params["blocks"][i], x, cfg, ws, tables, dprs[i], brng,
                fused_ok, attn_chunk)
    return x
