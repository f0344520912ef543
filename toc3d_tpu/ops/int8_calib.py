"""Static activation-scale calibration for the int8 serving path.

The int8 block kernels (ops/pallas/vit_block.py) quantize activations
per-row at runtime (dynamic amax). Static calibration captures per-block,
per-site activation maxima over N representative frames ONCE and bakes them
into the quantized params, so the serving kernels quantize at fixed scales —
dropping the per-row |x| reduction from the critical path of every hot
matmul (reference analogue: standard PTQ static activation calibration;
this is r3 #6c / VERDICT r4 #4).

Four sites per block, matching exactly where the kernels quantize
(vit_block._ACT_SITES):
  attn_in — post-LN1 tokens (shared input of the Q/K/V matmuls; the
            d**-0.5 fold lives in the weights so the input site is scale-
            free),
  proj_in — pre-O-proj merged attention output,
  mlp_in  — post-LN2 tokens (shared input of the SwiGLU w1/w2 matmuls),
  ffn_in  — post-ffn_ln hidden (input of w3).

The probes below recompute those sites with the same XLA math the kernels
mirror (eva_vit._block_forward_xla:269, toc3d_vit.toc3d_block_forward:113),
driven by per-block inputs collected from one real forward
(extract_img_feat(collect_block_outs=True)). Calibration runs on FLOAT
params (before quantize_block_params) at eval semantics.

Usage:
    scales = calibrate_act_scales(params, cfg, frames)   # N eval frames
    params = attach_act_scales(params, scales)
    # detector precast (cfg.backbone.quant='int8') then quantizes with
    # static scales automatically; bench.py --int8 --int8-calib N drives
    # this end to end.
"""
from __future__ import annotations

from dataclasses import replace

import jax
import jax.numpy as jnp
import numpy as np

from ..layers import layer_norm, linear
from ..ops.attention import _split_heads, _merge_heads, _sdpa
from ..ops.rope import apply_rope, apply_rope_select
from ..ops.window import window_partition, window_unpartition
from ..ops.gather import batch_index_select, merge_tokens
from ..models.eva_vit import LN_EPS
from .pallas.vit_block import _ACT_SITES


def _attn_preproj(p, x, num_heads, rope_tables=None, select_idx=None):
    """ops.attention.eva_attention up to the pre-O-proj merged output —
    the kernels' 'proj_in' quantization site."""
    b, n, c = x.shape
    q = _split_heads(linear(p["q_proj"], x), num_heads)
    k = _split_heads(linear(p["k_proj"], x), num_heads)
    v = _split_heads(linear(p["v_proj"], x), num_heads)
    if rope_tables is not None:
        cos, sin = rope_tables
        if select_idx is not None:
            q = apply_rope_select(q, cos, sin, select_idx).astype(v.dtype)
            k = apply_rope_select(k, cos, sin, select_idx).astype(v.dtype)
        else:
            q = apply_rope(q, cos, sin).astype(v.dtype)
            k = apply_rope(k, cos, sin).astype(v.dtype)
    scale = (c // num_heads) ** -0.5
    return _merge_heads(_sdpa(q, k, v, scale, x.dtype))


def _swiglu_sites(p, x2):
    """mlp_in / ffn_in amaxes given the post-LN2 tokens x2."""
    x1 = linear(p["w1"], x2)
    xg = linear(p["w2"], x2)
    hidden = jax.nn.silu(x1) * xg
    hidden = layer_norm(p["ffn_ln"], hidden, eps=LN_EPS)
    return _amax(x2), _amax(hidden)


def _amax(t):
    return jnp.max(jnp.abs(t.astype(jnp.float32)))


def full_block_site_amax(p, x, num_heads, ws, tables):
    """Site amaxes of one full (non-compressed) block at eval semantics
    (eva_vit._block_forward_xla:269-292, droppath inactive)."""
    b, h, w, c = x.shape
    xl = layer_norm(p["norm1"], x, eps=LN_EPS)
    xw, padded = window_partition(xl, ws)
    nwin, wsh, wsw, _ = xw.shape
    xw = xw.reshape(nwin, wsh * wsw, c)
    a_attn = _amax(xw)
    o = _attn_preproj(p["attn"], xw, num_heads, tables)
    a_proj = _amax(o)
    ow = linear(p["attn"]["proj"], o).reshape(nwin, wsh, wsw, c)
    x = x + window_unpartition(ow, ws, padded, (h, w))
    x2 = layer_norm(p["norm2"], x, eps=LN_EPS)
    a_mlp, a_ffn = _swiglu_sites(p["mlp"], x2)
    return dict(zip(_ACT_SITES, (a_attn, a_proj, a_mlp, a_ffn)))


def compressed_block_site_amax(p, x, scores, cfg, ws, ratio, tables):
    """Site amaxes of one token-compressed block
    (toc3d_vit.toc3d_block_forward:113 prelude + slow path)."""
    from ..models.toc3d_vit import ToC3DViTConfig  # noqa: F401 (doc)
    from ..models.token_select import sample_topk, keep_count

    bn, h, w, c = x.shape
    xw, _ = window_partition(x, ws)
    sw, _ = window_partition(scores.reshape(bn, h, w, 1), ws,
                             pad_value=-1e6)
    nw = xw.shape[0]
    n = ws * ws
    xw = xw.reshape(nw, n, c)
    sw = sw.reshape(nw, n)
    k = keep_count(n, ratio, n_rep=1 if cfg.use_represent_tokens else 0,
                   mxu_align=cfg.mxu_align_k)
    slow_score, fast_score, slow_idx, fast_idx = sample_topk(sw, ratio, k=k)
    slow = batch_index_select(xw, slow_idx)
    fast = batch_index_select(xw, fast_idx)
    use_rep = cfg.use_represent_tokens and fast.shape[1] > 0
    if use_rep:
        rep = merge_tokens(fast, fast_score)
        slow = jnp.concatenate([slow, rep], axis=1)
    if cfg.rope and cfg.rope_acc:
        if use_rep:
            rep_idx = jnp.full((nw, 1), k, dtype=slow_idx.dtype)
            sel_idx = jnp.concatenate([slow_idx, rep_idx], axis=-1)
        else:
            sel_idx = slow_idx
    else:
        sel_idx, tables = None, None

    hdn = layer_norm(p["norm1"], slow, eps=LN_EPS)
    a_attn = _amax(hdn)
    o = _attn_preproj(p["attn"], hdn, cfg.num_heads, tables, sel_idx)
    a_proj = _amax(o)
    slow = slow + linear(p["attn"]["proj"], o)
    x2 = layer_norm(p["norm2"], slow, eps=LN_EPS)
    a_mlp, a_ffn = _swiglu_sites(p["mlp"], x2)
    return dict(zip(_ACT_SITES, (a_attn, a_proj, a_mlp, a_ffn)))


def backbone_site_amax(params, cfg, frame, memory, _probe_cache=None):
    """Per-block site amaxes for one eval frame: one collected forward +
    per-block site probes. cfg is the DetectorConfig; returns a (depth, 4)
    f32 numpy array in _ACT_SITES order.

    Compile structure matters here: the first implementation traced the
    whole backbone AND all depth x 4 site probes into ONE jit with the
    params closed over as constants — at ViT-L 1600x800 that graph broke
    the axon remote-compile (40-min compile, then transport error). Now
    the collection forward is its own jit (the same program family as the
    split-step collector, runtime/train.collect_backbone_outs) and each
    probe is a SMALL per-shape jit (params as arguments, reused across
    blocks and frames — ~4 distinct probe shapes per model)."""
    from ..models.detector import extract_img_feat
    from ..models.eva_vit import make_rope_tables
    from ..ops.resize import resize_abs_pos

    bcfg = replace(cfg.backbone, drop_path_rate=0.0)  # eval: all sites
    dcfg = replace(cfg, backbone=bcfg)                # collectable

    collect = jax.jit(lambda p, f, m: extract_img_feat(
        p, dcfg, f["img"], m, f, rng=None, remat=False,
        fused_ok=True, collect_block_outs=True)[1:])
    aux, collected = collect(params, frame, memory)

    bb = params["img_backbone"]
    bcfg_b = dcfg.backbone
    probes = _probe_cache if _probe_cache is not None else {}

    def full_probe(ws):
        key = ("full", ws)
        if key not in probes:
            probes[key] = jax.jit(
                lambda p, x, t, ws=ws: jnp.stack(
                    [full_block_site_amax(p, x, bcfg_b.num_heads, ws,
                                          t or None)[k]
                     for k in _ACT_SITES]))
        return probes[key]

    def comp_probe(ws, ratio):
        key = ("comp", ws, ratio)
        if key not in probes:
            probes[key] = jax.jit(
                lambda p, x, s, t, ws=ws, ratio=ratio: jnp.stack(
                    [compressed_block_site_amax(p, x, s, bcfg_b, ws, ratio,
                                                t or None)[k]
                     for k in _ACT_SITES]))
        return probes[key]

    x = collected["patch_embed"]
    if bcfg_b.use_abs_pos:
        x = x + resize_abs_pos(bb["pos_embed"], bcfg_b.pretrain_use_cls_token,
                               (x.shape[1], x.shape[2])).astype(x.dtype)
    rope_win, rope_glb = make_rope_tables(bcfg_b)
    bn = x.shape[0]
    rows = []
    seg = 0
    ratio = None
    scores = None
    for i in range(bcfg_b.depth):
        if i in bcfg_b.pruning_loc:
            scores = aux["scores"][seg].reshape(bn, -1)
            ratio = bcfg_b.selector_config(seg).ratio
            seg += 1
        is_global = i in bcfg_b.global_attn_indexes
        ws = bcfg_b.global_window_size if is_global else bcfg_b.window_size
        tables = rope_glb if is_global else rope_win
        tables = tuple(tables) if (bcfg_b.rope and tables) else ()
        if bcfg_b.block_is_accelerated(i):
            row = comp_probe(ws, ratio)(bb["blocks"][i], x, scores, tables)
        else:
            row = full_probe(ws)(bb["blocks"][i], x, tables)
        rows.append(np.asarray(row, np.float64))
        x = collected["blocks"][i]
    return np.stack(rows)                      # (depth, 4)


def calibrate_act_scales(params, cfg, frames, headroom: float = 1.0):
    """Calibrate static activation scales over N eval frames.

    params: FLOAT detector params (before any quantization/precast).
    frames: iterable of eval frame dicts (loader build_eval_frame /
    bench.make_frame shapes). Returns a per-block list of
    {'attn_in','proj_in','mlp_in','ffn_in'} -> f32 scale (= running-amax
    * headroom / 127) ready for attach_act_scales. headroom > 1 trades
    resolution for saturation margin on unseen outliers."""
    from ..models.streampetr_head import init_memory

    probe_cache = {}
    running = None
    for frame in frames:
        memory = init_memory(frame["img"].shape[0], cfg.head)
        amax = backbone_site_amax(params, cfg, frame, memory,
                                  _probe_cache=probe_cache)
        running = amax if running is None else np.maximum(running, amax)
    assert running is not None, "calibration needs at least one frame"
    scales = np.maximum(running * headroom, 1e-6) / 127.0
    return [dict(zip(_ACT_SITES, row.astype(np.float32)))
            for row in scales]


def attach_act_scales(params, scales):
    """Return a params tree carrying the calibrated scales where the
    detector precast (models/detector._precast_backbone_params) picks them
    up; the float weights are untouched."""
    out = dict(params)
    bb = dict(out["img_backbone"])
    assert len(scales) == len(bb["blocks"]), (len(scales), len(bb["blocks"]))
    bb["act_scales"] = [
        {k: jnp.asarray(s[k], jnp.float32) for k in _ACT_SITES}
        for s in scales]
    out["img_backbone"] = bb
    return out
