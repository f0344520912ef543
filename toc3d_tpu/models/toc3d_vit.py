"""ToC3D EVA-ViT backbone: EVA-02 ViT with Motion Query-guided Token
Compression — slow/fast per-window routing with a representative token.

Capability parity target: reference
  projects/mmdet3d_plugin/models/backbones/toc3d_eva_vit.py
  (ToC3DEVAViT:25, ToC3DEVAViTBlock:329, ToC3DEVAAttention:480).

TPU-first design:
  * keep-count per window is int(ws*ws*ratio) — a static python int, so the
    slow path is a fixed-shape (k+1)-token attention: zero dynamic shapes,
    zero recompiles across frames (SURVEY.md §7 crux).
  * selection + gather + merge + scatter are take_along_axis / .at[].set ops
    that XLA fuses; a fused Pallas select-attend-scatter kernel can slot in
    behind the same function signature.
  * the slow-path RoPE gathers table rows at kept indices; the representative
    token uses flat index k (== slow_index.shape[-1]), matching the
    reference's convention (toc3d_eva_vit.py:433-435).
"""
from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..layers import layer_norm, swiglu
from ..ops.attention import eva_attention
from ..ops.gather import batch_index_select, batch_index_fill, merge_tokens
from ..ops.resize import resize_abs_pos
from ..ops.window import window_partition, window_unpartition
from .eva_vit import (EVAViTConfig, LN_EPS, init_eva_vit, make_rope_tables,
                      patch_embed, block_forward, drop_path_rates)
from .token_select import (SelectorConfig, init_selector, selector_score,
                           sample_topk, soft_mask, keep_count)


@dataclass(frozen=True)
class ToC3DViTConfig(EVAViTConfig):
    """EVA ViT + token-compression knobs (ToC3D_fast.py:41-69)."""
    pruning_loc: Tuple[int, ...] = (6, 12, 18)
    token_ratio: Tuple[float, ...] = (0.7, 0.5, 0.5)
    pruning_num_queries: int = 64
    pruning_score_type: str = "attention"
    pruning_attn_scale: bool = True
    score_mask: bool = True
    accelerate_global: bool = True
    use_represent_tokens: bool = True
    rope_acc: bool = True
    query_dim: int = 256
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)
    # eval-time token mask semantics (toc3d_utils.py:146-157 sample()):
    #   'softmax' — noiseless gumbel-softmax channel 0 (our deterministic
    #               default, equal in expectation to the reference);
    #   'gumbel'  — reference strict parity: the reference keeps
    #               F.gumbel_softmax NOISY at eval (hard_score=False ships in
    #               every config), so eval is stochastic; needs a mask rng;
    #   'hard'    — reference hard_score=True branch: 0/1 top-k mask.
    eval_mask: str = "softmax"
    # TPU-first divergence (default ON): drop one kept token per window when
    # k + 1 lands exactly one row over a 128-lane MXU tile (ws=16/ratio=.5:
    # 129 -> 128), halving the compressed attention's padded lanes and
    # trimming its padded rows. Selection-identical otherwise; the dropped
    # 128th token still feeds the representative-token merge. Set False for
    # strict reference keep counts (token_select.keep_count).
    mxu_align_k: bool = True

    def __post_init__(self):
        overlap = set(self.pruning_loc) & set(self.global_attn_indexes)
        assert not overlap, (
            "pruning layers cannot be global attention layers "
            f"(toc3d_eva_vit.py:141-142): {overlap}")

    def selector_config(self, i: int) -> SelectorConfig:
        return SelectorConfig(
            embed_dim=self.embed_dim, query_dim=self.query_dim,
            num_queries=self.pruning_num_queries,
            ratio=self.token_ratio[i], attn_scale=self.pruning_attn_scale,
            use_mask=self.score_mask, score_type=self.pruning_score_type,
            pc_range=self.pc_range)

    def block_is_accelerated(self, i: int) -> bool:
        if not self.pruning_loc:
            return False
        if i < self.pruning_loc[0]:
            return False
        if i in self.global_attn_indexes:
            return self.accelerate_global
        return True


def toc3d_fast_config(**kw) -> ToC3DViTConfig:
    return ToC3DViTConfig(token_ratio=(0.7, 0.5, 0.5), **kw)


def toc3d_faster_config(**kw) -> ToC3DViTConfig:
    return ToC3DViTConfig(token_ratio=(0.5, 0.4, 0.3), **kw)


def init_toc3d_vit(key, cfg: ToC3DViTConfig):
    k1, *ks = jax.random.split(key, 1 + len(cfg.pruning_loc))
    params = init_eva_vit(k1, cfg)
    params["score_predictor"] = [
        init_selector(ks[i], cfg.selector_config(i))
        for i in range(len(cfg.pruning_loc))]
    return params


# ---------------------------------------------------------------------------
# accelerated block
# ---------------------------------------------------------------------------

def toc3d_block_forward(p, x, scores, cfg: ToC3DViTConfig, window_size: int,
                        ratio: float, rope_tables,
                        attn_chunk: Optional[int] = None):
    """Slow/fast token routing inside one window-attention block.

    x: (BN, H, W, C); scores: (BN, H*W) importance (log-prob channel 0).
    Mirrors ToC3DEVAViTBlock.forward accelerate path
    (toc3d_eva_vit.py:395-473).
    attn_chunk: train-time bounded-memory attention (ops.attention).
    """
    if "w_scale" in p["attn"]["q_proj"]:
        raise ValueError(
            "int8-quantized block params reached the XLA block path — the "
            "int8 serving path lives in the fused kernels only "
            "(ToC3DViTConfig.quant='int8' requires fused_blocks on a TPU "
            "backend); re-init or keep the float params for this path")
    bn, h, w, c = x.shape
    xw, padded = window_partition(x, window_size)                # (BNw, ws, ws, C)
    sw, _ = window_partition(scores.reshape(bn, h, w, 1), window_size,
                             pad_value=-1e6)
    nw = xw.shape[0]
    n = window_size * window_size
    xw = xw.reshape(nw, n, c)
    sw = sw.reshape(nw, n)

    k = keep_count(n, ratio, n_rep=1 if cfg.use_represent_tokens else 0,
                   mxu_align=cfg.mxu_align_k)
    slow_score, fast_score, slow_idx, fast_idx = sample_topk(sw, ratio, k=k)

    slow = batch_index_select(xw, slow_idx)                      # (NW, k, C)
    fast = batch_index_select(xw, fast_idx)                      # (NW, n-k, C)

    use_rep = cfg.use_represent_tokens and fast.shape[1] > 0
    if use_rep:
        rep = merge_tokens(fast, fast_score)                     # (NW, 1, C)
        slow = jnp.concatenate([slow, rep], axis=1)              # (NW, k+1, C)

    if cfg.rope and cfg.rope_acc:
        if use_rep:
            rep_idx = jnp.full((nw, 1), k, dtype=slow_idx.dtype)
            sel_idx = jnp.concatenate([slow_idx, rep_idx], axis=-1)
        else:
            sel_idx = slow_idx
        tables = rope_tables
    else:
        sel_idx, tables = None, None

    # slow path (toc3d_eva_vit.py:366-386): pre-LN attn + pre-LN SwiGLU,
    # raw deltas retained for the fast-path broadcast update.
    shortcut = slow
    hdn = layer_norm(p["norm1"], slow, eps=LN_EPS)
    raw1 = eva_attention(p["attn"], hdn, cfg.num_heads, tables, sel_idx,
                         attn_chunk=attn_chunk)
    slow = shortcut + raw1
    raw2 = swiglu(p["mlp"], layer_norm(p["norm2"], slow, eps=LN_EPS),
                  ln_eps=LN_EPS)
    slow = slow + raw2

    if use_rep:
        slow, rep1, rep2 = slow[:, :-1], raw1[:, -1:], raw2[:, -1:]
        fast = fast + rep1 + rep2                                # broadcast add

    out = batch_index_fill(jnp.zeros_like(xw), slow, fast, slow_idx, fast_idx)
    out = out.reshape(nw, window_size, window_size, c)
    return window_unpartition(out, window_size, padded, (h, w))


# ---------------------------------------------------------------------------
# backbone forward
# ---------------------------------------------------------------------------

def injectable_sites(cfg: ToC3DViTConfig):
    """Which forward sites the two-program training split may inject
    (make_split_train_step): patch_embed, every accelerated (compressed)
    block, and full blocks whose stochastic-depth rate is 0 (droppath lives
    inside the block residuals, so a droppath-active block's precomputed
    output would not match the backward's linearization function). Shared
    by the collector and the injector so both programs agree."""
    dprs = drop_path_rates(cfg)
    return [cfg.block_is_accelerated(i) or dprs[i] <= 0.0
            for i in range(cfg.depth)]


def toc3d_vit_forward(params, x, cfg: ToC3DViTConfig, motion_ctx,
                      prev_exists, rope_tables=None, rng=None,
                      remat: bool = False, mask_rng=None,
                      fused_ok: bool = True, collect_block_outs: bool = False,
                      injected=None, attn_chunk: Optional[int] = None):
    """x: (BN, H, W, 3); motion_ctx: dict of memory-bank views (B-leading,
    see token_select.selector_score); prev_exists: (B,) float.

    mask_rng: eval-only PRNG for cfg.eval_mask='gumbel' (reference strict
    parity — the reference's eval token mask is gumbel-stochastic,
    toc3d_utils.py:146-147). Ignored when rng (training) is given.
    fused_ok: the train step passes False — Pallas custom calls inside the
    single differentiated train program kernel-fault the axon TPU worker
    (see eva_vit.block_forward); training takes the XLA path.

    Two-program training split (runtime/train.make_split_train_step):
    collect_block_outs=True additionally returns a third element
    {'patch_embed': o, 'blocks': [o_i or None]} of per-site outputs (None at
    non-injectable sites, see injectable_sites) for a later differentiated
    pass; injected=<that structure> replaces each site's computation with
    ops.pallas.vit_block.make_injected_op — primal from the precomputed
    kernel output, backward via the exact XLA vjp — so the differentiated
    program contains no Pallas custom calls.

    Returns (features (BN, h, w, C), aux dict with token_masks / scores /
    keep_idx / drop_idx lists — one entry per pruning layer).
    """
    if rng is not None and cfg.mxu_align_k:
        # ADVICE r4: training keeps the reference's exact keep counts
        # (k = int(n*ratio), toc3d_utils.py:138). mxu_align_k is a
        # serving-side padding optimization (drop the 129th token when
        # k+1 ≡ 1 mod 128) that stays opt-in for inference; a finetune
        # must see the counts the released checkpoints were trained with.
        # The two-program split's collector also passes rng, so both
        # training programs agree.
        cfg = replace(cfg, mxu_align_k=False)
    if rope_tables is None:
        rope_tables = make_rope_tables(cfg)
    rope_win, rope_glb = rope_tables
    collected = {"blocks": []} if collect_block_outs else None
    inj = (lambda i: None) if injected is None \
        else (lambda i: injected["blocks"][i])
    if injected is not None and injected.get("patch_embed") is not None:
        from ..ops.pallas.vit_block import make_injected_op
        from .eva_vit import _patch_embed_conv
        ps = cfg.patch_size
        x = make_injected_op(
            lambda p_, x_: _patch_embed_conv(p_, x_, ps))(
                injected["patch_embed"], params["patch_embed"], x)
    else:
        x = patch_embed(params["patch_embed"], x, cfg.patch_size,
                        fused_ok=fused_ok)
    if collect_block_outs:
        collected["patch_embed"] = x
    if cfg.use_abs_pos:
        x = x + resize_abs_pos(params["pos_embed"], cfg.pretrain_use_cls_token,
                               (x.shape[1], x.shape[2])).astype(x.dtype)

    bn, h, w, c = x.shape
    dprs = drop_path_rates(cfg)
    masks = jnp.ones((bn, h, w, 1), x.dtype)
    aux = {"token_masks": [], "attn_scores": [], "keep_idx": [], "drop_idx": [],
           "scores": []}
    scores = None
    seg = 0
    ratio = None

    for i in range(cfg.depth):
        if i in cfg.pruning_loc:
            scfg = cfg.selector_config(seg)
            sel_rng = None
            if rng is not None:
                rng, sel_rng = jax.random.split(rng)
            elif cfg.eval_mask == "gumbel" and mask_rng is not None:
                mask_rng, sel_rng = jax.random.split(mask_rng)
            scores, pred, attn = selector_score(
                params["score_predictor"][seg], scfg, x, masks, motion_ctx,
                prev_exists, train_blend=rng is not None)
            # whole-image keep/drop split (for vis + parity checks)
            ks, ds, ki, di = sample_topk(scores, scfg.ratio)
            if cfg.eval_mask == "hard" and rng is None:
                # reference hard_score=True eval branch: 0/1 top-k mask
                # (toc3d_utils.py:150-157)
                hard = jnp.zeros((bn, h * w, 1), x.dtype)
                hard = hard.at[jnp.arange(bn)[:, None], ki].set(1.0)
                masks = hard.reshape(bn, h, w, 1)
            else:
                masks = soft_mask(pred, sel_rng).reshape(bn, h, w, 1)
            aux["token_masks"].append(masks)
            aux["scores"].append(scores.reshape(bn, h, w))
            if attn is not None:
                aux["attn_scores"].append(attn)
            aux["keep_idx"].append(ki)
            aux["drop_idx"].append(di)
            ratio = scfg.ratio
            seg += 1

        is_global = i in cfg.global_attn_indexes
        ws = cfg.global_window_size if is_global else cfg.window_size
        tables = rope_glb if is_global else rope_win
        # fused megakernel on TPU: raw kernel at inference; in training the
        # custom-VJP wrapper keeps the kernel forward and re-derives exact
        # gradients through the XLA path (the compressed block has no
        # droppath, so semantics are identical)
        fused = (cfg.fused_blocks and fused_ok
                 and jax.default_backend() != "cpu")
        if cfg.block_is_accelerated(i):
            if inj(i) is not None:
                from ..ops.pallas.vit_block import make_injected_op
                xla_fn = (lambda ws=ws, ratio=ratio: lambda
                          p_, x_, s_, t_: toc3d_block_forward(
                              p_, x_, s_, cfg, ws, ratio,
                              t_ if t_ else None))()
                targ = tuple(tables) if (cfg.rope and tables) else ()
                x = make_injected_op(xla_fn)(
                    inj(i), params["blocks"][i], x, scores, targ)
            elif fused and rng is None and not remat:
                from ..ops.pallas.vit_block import fused_compressed_block
                x = fused_compressed_block(
                    params["blocks"][i], x, scores, cfg.num_heads, ws, ratio,
                    tables if cfg.rope else None,
                    use_represent=cfg.use_represent_tokens,
                    rope_acc=cfg.rope_acc, align_k=cfg.mxu_align_k)
            elif fused:
                from ..ops.pallas.vit_block import (
                    make_trainable_compressed_block)
                # RoPE tables travel as explicit operands (tuple, or () for
                # no-rope) — closing over them inside the custom-VJP leaks
                # tracers under jax.checkpoint (train-step remat)
                xla_fn = (lambda ws=ws, ratio=ratio: lambda
                          p_, x_, s_, t_: toc3d_block_forward(
                              p_, x_, s_, cfg, ws, ratio,
                              t_ if t_ else None))()
                f = make_trainable_compressed_block(
                    xla_fn, cfg.num_heads, ws, ratio,
                    cfg.use_represent_tokens, cfg.rope_acc,
                    align_k=cfg.mxu_align_k)
                if remat:
                    f = jax.checkpoint(f)
                targ = tuple(tables) if (cfg.rope and tables) else ()
                x = f(params["blocks"][i], x, scores, targ)
            else:
                fwd = toc3d_block_forward
                if remat:
                    fwd = jax.checkpoint(toc3d_block_forward,
                                         static_argnums=(3, 4, 5, 7))
                x = fwd(params["blocks"][i], x, scores, cfg, ws, ratio,
                        tables, attn_chunk)
        elif inj(i) is not None:
            # injectable full block (dp_rate == 0, see injectable_sites)
            from ..ops.pallas.vit_block import make_injected_op
            from .eva_vit import _block_forward_xla
            xla_fn = (lambda ws=ws: lambda p_, x_, t_: _block_forward_xla(
                p_, x_, cfg, ws, t_ if t_ else None, 0.0, None))()
            targ = tuple(tables) if (cfg.rope and tables) else ()
            x = make_injected_op(xla_fn)(inj(i), params["blocks"][i], x,
                                         targ)
        else:
            brng = None if rng is None else jax.random.fold_in(rng, 1000 + i)
            fwd = block_forward
            if remat:
                fwd = jax.checkpoint(block_forward,
                                     static_argnums=(2, 3, 5, 7, 8))
            x = fwd(params["blocks"][i], x, cfg, ws, tables, dprs[i], brng,
                    fused_ok, attn_chunk)
        if collect_block_outs:
            collected["blocks"].append(x)

    if collect_block_outs:
        ok = injectable_sites(cfg)
        collected["blocks"] = [o if ok[i] else None
                               for i, o in enumerate(collected["blocks"])]
        return x, aux, collected
    return x, aux
