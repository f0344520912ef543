"""Fused EVA-ViT transformer-block megakernels for TPU.

One pallas_call per block computes LN1 -> QKV -> RoPE -> window attention ->
O-proj -> +residual -> LN2 -> SwiGLU -> +residual, with the block's weights
resident in VMEM across grid steps and the (n, n) logits never leaving VMEM.

Why: the round-1 profile (tools/profile_backbone.py) showed the ViT-L
backbone at 1600x800 spending ~266 ms/frame across ~250 bandwidth-bound XLA
ops (~150 GB/s effective) with only ~43 ms of matmul. Fusing each block into
one kernel cuts per-layer HBM traffic to read-x + write-x (+weights once).

Capability parity: the math exactly mirrors the XLA path in
models/eva_vit.py:block_forward and models/toc3d_vit.py:toc3d_block_forward
(reference eva_vit.py:226-266, toc3d_eva_vit.py:329-473). Inference-only:
training keeps the XLA path (drop_path rng + autodiff).

Accuracy (measured on TPU v5e, ViT-L shapes): the kernel and the XLA path
are EQUALLY accurate — both sit 0.00304 mean abs from an
f32-highest-precision oracle (TPU default dots round operands to bf16) and
only 0.00034 from each other. End-to-end feature diffs between the two
paths come from top-k token-selection flips under that shared rounding
noise (clustered random-weight scores), not from kernel error.

Token-compressed blocks use a dense gather/scatter-by-matmul formulation:
a per-window matrix G (k+1 rows, n cols) holds one-hot rows for the slow
tokens and a score-weight row for the representative token, so gather
(G @ x), merge, and scatter (G_slow^T @ y) are all MXU matmuls — no
dynamic indexing inside the kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..window import pad_hw

LN_EPS = 1e-6
# tests flip this to exercise the flat window-partition fallback layout
FORCE_FLAT_LAYOUT = False
# Route ws%8==0 layers through STRIPE mode too (blocks = whole window-rows,
# LN/QKV/proj/FFN batched over the row's nwj windows). Image mode runs one
# window per grid step — M=80..256 rows per matmul; stripe raises M by nwj
# (7x at 1600x800), amortizing weight stationarity and MXU tiling. Set per
# kernel family from measurements (tools/profile_backbone.py); env overrides
# for A/B profiling.
# MEASURED (v5e, ToC3D_faster_1600, device-lane profile): both flags are
# parity-to-slightly-worse — full ws16 layers 6.72 ms either way (commit
# a6aa38a), compressed ws16 layers 4.07->4.17 ms (ratio .5) / unchanged
# (ratios .4/.3) with stripe. The image-mode kernels already run at 75-85%
# of padded MXU peak, so batching M across windows buys nothing; stripe
# stays ON only where it is the point: ws%8!=0 layers, where image-layout
# blocks are illegal and the alternative costs 4 HBM relayout copies.
import os as _os
STRIPE_WS8_FULL = _os.environ.get("TOC3D_STRIPE_WS8_FULL", "0") == "1"
STRIPE_WS8_COMPRESSED = (
    _os.environ.get("TOC3D_STRIPE_WS8_COMPRESSED", "0") == "1")


def _ln(x, scale, bias, eps=LN_EPS):
    x32 = x.astype(jnp.float32)
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mu), axis=-1, keepdims=True)
    y = (x32 - mu) * jax.lax.rsqrt(var + eps)
    y = y * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return y.astype(x.dtype)


def _rotate_half(x):
    """(N, D) pairwise rotation (a, b) -> (-b, a) via rolls + parity mask
    (Mosaic rejects lane-splitting pair reshapes; 32-bit data only)."""
    n, d = x.shape
    left = pltpu.roll(x, d - 1, 1)
    right = pltpu.roll(x, 1, 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, d), 1)
    return jnp.where((col % 2) == 0, -left, right)


def _rope(t, cos, sin):
    """t: (N, D) bf16; cos/sin: (N, D) f32. Returns t's dtype (matches the
    XLA path: rope product in f32, cast back to v dtype)."""
    t32 = t.astype(jnp.float32)
    return (t32 * cos + _rotate_half(t32) * sin).astype(t.dtype)


def _attention(x, refs, num_heads, cos, sin, n_valid, out_dtype):
    """Pre-LN multi-head window attention core on (n, C) tokens.

    refs: dict of weight refs. cos/sin: (n, d) f32 or None. Columns >=
    n_valid are masked out of the softmax. Returns (n, C).

    VPU-lean formulation (measured −10..−30% kernel time at ViT-L shapes):
    the d**-0.5 scale is folded into wq/bq by _flatten_params (rope is a
    rotation, so rope(scale*q) == scale*rope(q)); rope runs as ONE pass over
    all heads (tables tiled head-wise — the pair rotation never crosses the
    head-dim lane boundary since d is even); and the softmax normalization
    divides the (n, d) PV product instead of the (n, n) probability matrix.
    """
    n, c = x.shape
    d = c // num_heads
    quant = "sq" in refs
    if quant:
        hq, hs = _actquant(x, refs, "csa")
        qf = _qmm(hq, hs, refs["wq"], refs["sq"])
        qf = qf + refs["bq"][:].astype(jnp.float32)
        kf = _qmm(hq, hs, refs["wk"], refs["sk"])
        v = _qmm(hq, hs, refs["wv"], refs["sv"])
        v = (v + refs["bv"][:].astype(jnp.float32)).astype(x.dtype)
    else:
        qf = jnp.dot(x, refs["wq"][:], preferred_element_type=jnp.float32)
        qf = qf + refs["bq"][:].astype(jnp.float32)
        kf = jnp.dot(x, refs["wk"][:], preferred_element_type=jnp.float32)
        v = jnp.dot(x, refs["wv"][:], preferred_element_type=jnp.float32)
        v = (v + refs["bv"][:].astype(jnp.float32)).astype(x.dtype)

    if cos is not None:
        cosf = jnp.concatenate([cos] * num_heads, axis=-1)
        sinf = jnp.concatenate([sin] * num_heads, axis=-1)
        q = (qf * cosf + _rotate_half(qf) * sinf).astype(x.dtype)
        k = (kf * cosf + _rotate_half(kf) * sinf).astype(x.dtype)
    else:
        q = qf.astype(x.dtype)
        k = kf.astype(x.dtype)

    heads = []
    for h in range(num_heads):
        qh = q[:, h * d:(h + 1) * d]
        kh = k[:, h * d:(h + 1) * d]
        vh = v[:, h * d:(h + 1) * d]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if n_valid < n:
            colm = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
            s = jnp.where(colm >= n_valid, jnp.float32(-1e30), s)
        m = jnp.max(s, axis=-1, keepdims=True)
        p32 = jnp.exp(s - m)
        l = jnp.sum(p32, axis=-1, keepdims=True)
        pv = jax.lax.dot_general(p32.astype(x.dtype), vh,
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        heads.append((pv / l).astype(x.dtype))
    o = jnp.concatenate(heads, axis=-1)
    if quant:
        oq, osc = _actquant(o, refs, "cso")
        o = _qmm(oq, osc, refs["wo"], refs["so"])
    else:
        o = jnp.dot(o, refs["wo"][:], preferred_element_type=jnp.float32)
    return (o + refs["bo"][:].astype(jnp.float32)).astype(out_dtype)


def _swiglu(x, refs):
    """SwiGLU with sub-LN on (n, C): silu(x@w1+b1) * (x@w2+b2) -> ffn_ln ->
    @w3+b3 (layers.swiglu parity)."""
    quant = "s1" in refs
    if quant:
        xq, xs = _actquant(x, refs, "csm")
        x1 = _qmm(xq, xs, refs["w1"], refs["s1"])
        x2 = _qmm(xq, xs, refs["w2"], refs["s2"])
    else:
        x1 = jnp.dot(x, refs["w1"][:], preferred_element_type=jnp.float32)
        x2 = jnp.dot(x, refs["w2"][:], preferred_element_type=jnp.float32)
    x1 = (x1 + refs["b1"][:].astype(jnp.float32)).astype(x.dtype)
    x2 = (x2 + refs["b2"][:].astype(jnp.float32)).astype(x.dtype)
    # silu in f32: Mosaic rejects the bf16 silu lowering (f32 scalar
    # broadcast into a bf16 vector)
    x1f = x1.astype(jnp.float32)
    hidden = ((x1f * jax.nn.sigmoid(x1f)).astype(x.dtype) * x2)
    hidden = _ln(hidden, refs["fls"][:], refs["flb"][:])
    if quant:
        hq, hs = _actquant(hidden, refs, "csf")
        y = _qmm(hq, hs, refs["w3"], refs["s3"])
    else:
        y = jnp.dot(hidden, refs["w3"][:], preferred_element_type=jnp.float32)
    return (y + refs["b3"][:].astype(jnp.float32)).astype(x.dtype)


_WEIGHT_NAMES = ("ln1s", "ln1b", "wq", "bq", "wk", "wv", "bv", "wo", "bo",
                 "ln2s", "ln2b", "w1", "b1", "w2", "b2", "fls", "flb",
                 "w3", "b3")
# per-output-channel dequant scales, present only on int8-quantized params
_QSCALE_NAMES = ("sq", "sk", "sv", "so", "s1", "s2", "s3")
# static per-site activation scales (calibrated, ops.int8_calib), present
# only when quantize_block_params ran with act_scales: attention input,
# pre-O-proj attention output, SwiGLU input, post-ffn_ln hidden
_ASCALE_NAMES = ("csa", "cso", "csm", "csf")
_ACT_SITES = ("attn_in", "proj_in", "mlp_in", "ffn_in")


def is_quantized(p):
    """Falsy if float params; 'dynamic' if quantize_block_params ran
    (per-row in-kernel activation quant); 'static' if it ran with
    calibrated act_scales (per-site scalar activation quant)."""
    if "w_scale" not in p["attn"]["q_proj"]:
        return False
    return "static" if "act_scales" in p else "dynamic"


def quantize_block_params(p, num_heads: int, act_scales=None):
    """Symmetric per-output-channel int8 quantization of the block's seven
    weight matrices (QKV/O-proj and the three SwiGLU matmuls) for the
    serving int8 kernel path: w -> int8, plus a 'w_scale' f32 (out,) row.

    The attention d**-0.5 scale is folded into q_proj's weight BEFORE
    quantization (the bf16 path folds it in _flatten_params); biases and LN
    params are untouched (they stay f32 in-kernel). Run ONCE outside the
    streaming program (detector._precast_backbone_params) — in-graph it
    would re-quantize every frame.

    act_scales: optional calibrated static activation scales for this block
    ({'attn_in','proj_in','mlp_in','ffn_in'} -> f32 scalar = amax/127,
    ops.int8_calib.calibrate_act_scales). When given, the kernels quantize
    activations with these fixed scales instead of per-row dynamic amax —
    dropping the per-row |x| reduction from every hot matmul's critical
    path (r3 #6c / VERDICT r4 #4)."""
    def q(d, pre_scale=1.0):
        w = d["w"].astype(jnp.float32) * pre_scale
        s = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        wq = jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8)
        out = dict(d)
        out["w"] = wq
        out["w_scale"] = s
        return out

    a = dict(p["attn"])
    m = dict(p["mlp"])
    scale = (a["q_proj"]["w"].shape[1] // num_heads) ** -0.5
    a["q_proj"] = q(a["q_proj"], scale)
    a["k_proj"] = q(a["k_proj"])
    a["v_proj"] = q(a["v_proj"])
    a["proj"] = q(a["proj"])
    m["w1"] = q(m["w1"])
    m["w2"] = q(m["w2"])
    m["w3"] = q(m["w3"])
    out = dict(p)
    out["attn"] = a
    out["mlp"] = m
    if act_scales is not None:
        out["act_scales"] = {
            k: jnp.asarray(act_scales[k], jnp.float32).reshape(1, 1)
            for k in _ACT_SITES}
    return out


def _rowquant(x):
    """Dynamic symmetric per-row int8 activation quantization.

    x: (m, k) any float dtype -> (int8 (m, k), f32 (m, 1) dequant scale)."""
    x32 = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    s = jnp.maximum(amax, 1e-6) * (1.0 / 127.0)
    xq = jnp.clip(jnp.round(x32 * (127.0 / jnp.maximum(amax, 1e-6))),
                  -127.0, 127.0).astype(jnp.int8)
    return xq, s


def _statquant(x, s_ref):
    """Static-scale int8 activation quantization: s = calibrated amax/127
    ((1,1) f32 VMEM ref). Out-of-range activations saturate at ±127 —
    standard static-quant semantics; calibration uses running amax over
    the calibration frames so saturation only hits unseen outliers."""
    s = s_ref[:].astype(jnp.float32)               # (1, 1)
    inv = 1.0 / s
    xq = jnp.clip(jnp.round(x.astype(jnp.float32) * inv),
                  -127.0, 127.0).astype(jnp.int8)
    return xq, s


def _actquant(x, refs, site):
    """Per-site activation quantization: static when the block params carry
    calibrated scales (_ASCALE_NAMES in refs), dynamic per-row otherwise."""
    return _statquant(x, refs[site]) if site in refs else _rowquant(x)


def _qmm(xq, xs, w_ref, s_ref):
    """int8 x int8 -> int32 MXU dot, dequantized to f32: (xq @ w) * xs * s.

    Measured on v5e at the megakernel's shapes (M=144, K=N=1024): 266 TOP/s
    sustained including the rowquant + rescale VPU work vs 193 TFLOP/s for
    the bf16 dot — 1.38x per weight matmul."""
    y = jnp.dot(xq, w_ref[:], preferred_element_type=jnp.int32)
    return y.astype(jnp.float32) * (xs * s_ref[:].astype(jnp.float32))


def _flatten_params(p, dtype, num_heads):
    """Block param pytree -> flat tuple in _WEIGHT_NAMES (+ _QSCALE_NAMES
    when int8-quantized) order. Weights cast to the compute dtype (already
    int8 after quantize_block_params); LN params stay f32 (stats are f32
    in-kernel). The attention scale d**-0.5 is folded into wq/bq (see
    _attention); for quantized params the wq fold already happened in
    quantize_block_params, the bq fold still happens here."""
    a = p["attn"]
    m = p["mlp"]
    f32 = jnp.float32
    quant = is_quantized(p)
    scale = jnp.float32((a["q_proj"]["w"].shape[1] // num_heads) ** -0.5)
    wcast = (lambda w: w) if quant else (lambda w: w.astype(dtype))
    wq = a["q_proj"]["w"] if quant else a["q_proj"]["w"] * scale
    flat = (
        p["norm1"]["scale"].astype(f32), p["norm1"]["bias"].astype(f32),
        wcast(wq),
        (a["q_proj"]["b"] * scale).astype(f32),
        wcast(a["k_proj"]["w"]),
        wcast(a["v_proj"]["w"]), a["v_proj"]["b"].astype(f32),
        wcast(a["proj"]["w"]), a["proj"]["b"].astype(f32),
        p["norm2"]["scale"].astype(f32), p["norm2"]["bias"].astype(f32),
        wcast(m["w1"]["w"]), m["w1"]["b"].astype(f32),
        wcast(m["w2"]["w"]), m["w2"]["b"].astype(f32),
        m["ffn_ln"]["scale"].astype(f32), m["ffn_ln"]["bias"].astype(f32),
        wcast(m["w3"]["w"]), m["w3"]["b"].astype(f32),
    )
    if quant:
        flat = flat + tuple(
            d["w_scale"].astype(f32)
            for d in (a["q_proj"], a["k_proj"], a["v_proj"], a["proj"],
                      m["w1"], m["w2"], m["w3"]))
    if quant == "static":
        flat = flat + tuple(p["act_scales"][k].astype(f32)
                            for k in _ACT_SITES)
    return flat


def _names(quant):
    """quant: falsy | 'dynamic'/True | 'static' (is_quantized return)."""
    names = _WEIGHT_NAMES + (_QSCALE_NAMES if quant else ())
    return names + (_ASCALE_NAMES if quant == "static" else ())


def _weight_specs(quant: bool = False):
    return [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in _names(quant)]


# ---------------------------------------------------------------------------
# full (non-compressed) block
# ---------------------------------------------------------------------------

def _window_valid_mask(ws: int, hw, i, j):
    """(n, 1) bool validity of window (i, j)'s tokens against the real
    image bounds — True semantics of zero-padding without materializing the
    pad: grid blocks may overrun the (unpadded) array, reads there are
    unspecified, so invalid tokens are zeroed in-kernel (identical math to
    the reference's zero-padded windows) and their writes are dropped by
    the out-of-bounds store masking."""
    t = jax.lax.broadcasted_iota(jnp.int32, (ws * ws, 1), 0)
    return ((i * ws + t // ws) < hw[0]) & ((j * ws + t % ws) < hw[1])


def _load_window(x_ref, mode: str, ws: int, sanitize_hw):
    """This grid step's window as (n, C) tokens, zeroed where outside the
    real image."""
    n = ws * ws
    c = x_ref.shape[-1]
    if mode == "flat":
        return x_ref[0]
    x = x_ref[0].reshape(n, c)                   # image: (1, ws, ws, C)
    if sanitize_hw is not None:
        i, j = pl.program_id(1), pl.program_id(2)
        x = jnp.where(_window_valid_mask(ws, sanitize_hw, i, j), x,
                      jnp.zeros_like(x))
    return x


def _store_window(o_ref, y, mode: str, ws: int):
    c = o_ref.shape[-1]
    if mode == "flat":
        o_ref[0] = y
    else:
        o_ref[0] = y.reshape(ws, ws, c)


def _stripe_tokens(x_ref, ws: int, nwj: int, sanitize_hw):
    """Stripe block (1, ws, w, C) -> (nwj*ws*ws, C) window-major tokens.

    Rows below the real image bottom are zeroed (the stripe grid may
    overrun h; Pallas loads there are unspecified and the matching stores
    are dropped). Columns are padded with zeros to nwj*ws when the image
    width is not a multiple of ws — identical zero-pad window semantics to
    the reference (eva_vit.py window_partition)."""
    x = x_ref[0]                                  # (ws, w, c)
    w, c = x.shape[1], x.shape[2]
    wp = nwj * ws
    if sanitize_hw is not None:
        i = pl.program_id(1)
        r = jax.lax.broadcasted_iota(jnp.int32, (ws, w, 1), 0)
        x = jnp.where(i * ws + r < sanitize_hw[0], x, jnp.zeros_like(x))
    if wp > w:
        x = jnp.concatenate(
            [x, jnp.zeros((ws, wp - w, c), x.dtype)], axis=1)
    # per-window slice + (ws, ws, C) -> (n, C) reshape (the same relayout
    # the wsplit block load used); a single 4-D transpose lowers terribly
    # in Mosaic (measured seconds per call)
    return jnp.concatenate(
        [x[:, j * ws:(j + 1) * ws, :].reshape(ws * ws, c)
         for j in range(nwj)], axis=0)


def _store_stripe(o_ref, y, ws: int, nwj: int):
    """(nwj*ws*ws, C) window-major tokens -> stripe block (1, ws, w, C)."""
    w, c = o_ref.shape[2], o_ref.shape[3]
    n = ws * ws
    cols = jnp.concatenate(
        [y[j * n:(j + 1) * n].reshape(ws, ws, c) for j in range(nwj)],
        axis=1)                                   # (ws, nwj*ws, C)
    o_ref[0] = cols[:, :w]


def _attention_grouped(x, refs, num_heads, cos, sin, group: int, nwj: int,
                       n_valid: int, out_dtype):
    """_attention over nwj independent windows batched in one (nwj*group, C)
    token array: ONE QKV / RoPE / O-proj pass, per-window softmax-attention
    on contiguous row slices. Same VPU-lean formulation as _attention.

    cos/sin: (group, d) shared across windows (full blocks) or
    (nwj*group, d) per-window tables (compressed blocks), f32, or None."""
    m, c = x.shape
    d = c // num_heads
    quant = "sq" in refs
    if quant:
        hq, hs = _actquant(x, refs, "csa")
        qf = _qmm(hq, hs, refs["wq"], refs["sq"])
        qf = qf + refs["bq"][:].astype(jnp.float32)
        kf = _qmm(hq, hs, refs["wk"], refs["sk"])
        v = _qmm(hq, hs, refs["wv"], refs["sv"])
        v = (v + refs["bv"][:].astype(jnp.float32)).astype(x.dtype)
    else:
        qf = jnp.dot(x, refs["wq"][:], preferred_element_type=jnp.float32)
        qf = qf + refs["bq"][:].astype(jnp.float32)
        kf = jnp.dot(x, refs["wk"][:], preferred_element_type=jnp.float32)
        v = jnp.dot(x, refs["wv"][:], preferred_element_type=jnp.float32)
        v = (v + refs["bv"][:].astype(jnp.float32)).astype(x.dtype)

    if cos is not None:
        cosf = jnp.concatenate([cos] * num_heads, axis=-1)
        sinf = jnp.concatenate([sin] * num_heads, axis=-1)
        if cosf.shape[0] != m:
            cosf = jnp.concatenate([cosf] * nwj, axis=0)
            sinf = jnp.concatenate([sinf] * nwj, axis=0)
        q = (qf * cosf + _rotate_half(qf) * sinf).astype(x.dtype)
        k = (kf * cosf + _rotate_half(kf) * sinf).astype(x.dtype)
    else:
        q = qf.astype(x.dtype)
        k = kf.astype(x.dtype)

    outs = []
    for j in range(nwj):
        sl = slice(j * group, (j + 1) * group)
        heads = []
        for hh in range(num_heads):
            qh = q[sl, hh * d:(hh + 1) * d]
            kh = k[sl, hh * d:(hh + 1) * d]
            vh = v[sl, hh * d:(hh + 1) * d]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if n_valid < group:
                colm = jax.lax.broadcasted_iota(jnp.int32, (group, group), 1)
                s = jnp.where(colm >= n_valid, jnp.float32(-1e30), s)
            mx = jnp.max(s, axis=-1, keepdims=True)
            p32 = jnp.exp(s - mx)
            l = jnp.sum(p32, axis=-1, keepdims=True)
            pv = jax.lax.dot_general(p32.astype(x.dtype), vh,
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
            heads.append((pv / l).astype(x.dtype))
        outs.append(jnp.concatenate(heads, axis=-1))
    o = jnp.concatenate(outs, axis=0)
    if quant:
        oq, osc = _actquant(o, refs, "cso")
        o = _qmm(oq, osc, refs["wo"], refs["so"])
    else:
        o = jnp.dot(o, refs["wo"][:], preferred_element_type=jnp.float32)
    return (o + refs["bo"][:].astype(jnp.float32)).astype(out_dtype)


def _full_block_kernel(x_ref, *rest, num_heads, ws, use_rope, mode,
                       sanitize_hw=None, quant=False):
    names = _names(quant)
    wrefs = dict(zip(names, rest[:len(names)]))
    rest = rest[len(names):]
    if use_rope:
        cos_ref, sin_ref, o_ref = rest
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)
    else:
        (o_ref,) = rest
        cos = sin = None
    n = ws * ws
    x = _load_window(x_ref, mode, ws, sanitize_hw)
    h = _ln(x, wrefs["ln1s"][:], wrefs["ln1b"][:])
    x = x + _attention(h, wrefs, num_heads, cos, sin, n, x.dtype)
    x = x + _swiglu(_ln(x, wrefs["ln2s"][:], wrefs["ln2b"][:]), wrefs)
    _store_window(o_ref, x, mode, ws)


def _full_block_stripe_kernel(x_ref, *rest, num_heads, ws, nwj, use_rope,
                              sanitize_hw=None, quant=False):
    """Full block on a (1, ws, w, C) stripe: LN/QKV/RoPE/O-proj/FFN batched
    over the stripe's nwj windows, attention per window."""
    names = _names(quant)
    wrefs = dict(zip(names, rest[:len(names)]))
    rest = rest[len(names):]
    if use_rope:
        cos_ref, sin_ref, o_ref = rest
        cos = cos_ref[:].astype(jnp.float32)
        sin = sin_ref[:].astype(jnp.float32)
    else:
        (o_ref,) = rest
        cos = sin = None
    n = ws * ws
    x = _stripe_tokens(x_ref, ws, nwj, sanitize_hw)
    h = _ln(x, wrefs["ln1s"][:], wrefs["ln1b"][:])
    x = x + _attention_grouped(h, wrefs, num_heads, cos, sin, n, nwj, n,
                               x.dtype)
    x = x + _swiglu(_ln(x, wrefs["ln2s"][:], wrefs["ln2b"][:]), wrefs)
    _store_stripe(o_ref, x, ws, nwj)


def _layout_plan(x, ws: int, prefer_stripe: bool = False):
    """Choose the kernel input layout.

    * ws % 8 == 0: image-layout blocks (1, ws, ws, C) straight on the
      unpadded image (Mosaic needs the second-to-last block dim divisible
      by 8). Grid blocks at the right/bottom edges overrun the array
      (Pallas masks those stores) and the kernel zeroes the overrun tokens
      (sanitize_hw) — exact zero-pad semantics without per-layer jnp.pad +
      unpad-slice copies.
    * ws % 8 != 0 (the ws=20 global layers): STRIPE mode — blocks
      (1, ws, W, C) are whole window-rows read straight off the standard
      row-major layout (the second-to-last block dim equals the array dim,
      exempt from Mosaic's %8 rule). The kernel splits the stripe into its
      nwj windows in VMEM and batches LN/QKV/proj/FFN over all of them.
      This replaced the earlier WSPLIT 5-D reshape trick: XLA lowered that
      "free" reshape as transpose-copy -> bitcast -> transpose-copy-back,
      costing four full-feature-map HBM copies (~240 MB, ~0.6 ms) per
      ws=20 layer at 1600x800; stripe blocks need none.
    * fallback (FORCE_FLAT_LAYOUT, tests): window-partition outside and
      feed flat (W, n, C) blocks.

    Returns (mode, xk, grid, spec, shape, unpack, widx, sanitize_hw, nwj)
    where nwj = windows covered per grid step (1 except stripe mode) and
    widx maps grid ids to the linear index of the step's FIRST window in
    window_partition order.
    """
    from ..window import window_partition

    b, h, w, c = x.shape
    hp, wp = pad_hw(h, w, ws)
    n = ws * ws
    if ws % 8 == 0 and not FORCE_FLAT_LAYOUT and not prefer_stripe:
        nh, nw_ = hp // ws, wp // ws
        grid = (b, nh, nw_)
        spec = pl.BlockSpec((1, ws, ws, c), lambda bb, i, j: (bb, i, j, 0),
                            memory_space=pltpu.VMEM)
        shape = (b, h, w, c)
        sanitize_hw = (h, w) if (hp > h or wp > w) else None

        def unpack(out):
            return out

        def widx(bb, i, j):
            return bb * nh * nw_ + i * nw_ + j

        return ("image", x, grid, spec, shape, unpack, widx, sanitize_hw, 1)

    if not FORCE_FLAT_LAYOUT:
        nh, nw_ = hp // ws, wp // ws
        grid = (b, nh)
        spec = pl.BlockSpec((1, ws, w, c), lambda bb, i: (bb, i, 0, 0),
                            memory_space=pltpu.VMEM)
        shape = (b, h, w, c)
        sanitize_hw = (h, w) if (hp > h or wp > w) else None

        def unpack(out):
            return out

        def widx(bb, i):
            return (bb * nh + i) * nw_

        return ("stripe", x, grid, spec, shape, unpack, widx, sanitize_hw,
                nw_)

    xw, padded = window_partition(x, ws)          # (W, ws, ws, C)
    nw = xw.shape[0]
    xw = xw.reshape(nw, n, c)
    grid = (nw,)
    spec = pl.BlockSpec((1, n, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = (nw, n, c)

    def unpack(out):
        from ..window import window_unpartition
        return window_unpartition(out.reshape(nw, ws, ws, c), ws, padded,
                                  (h, w))

    def widx(i):
        return i

    return ("flat", xw, grid, spec, shape, unpack, widx, None, 1)


def fused_full_block(p, x, num_heads: int, window_size: int, rope_tables,
                     interpret=None):
    """x: (B, H, W, C) image layout -> (B, H, W, C). One kernel, grid over
    windows; replaces block_forward's partition/attend/unpartition/MLP
    pipeline (eva_vit.py block_forward, reference eva_vit.py:226-266)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, c = x.shape
    ws = window_size
    n = ws * ws
    (mode, xk, grid, spec, shape, unpack, _, sanitize_hw,
     nwj) = _layout_plan(x, ws, prefer_stripe=STRIPE_WS8_FULL)
    use_rope = rope_tables is not None
    quant = is_quantized(p)
    weights = _flatten_params(p, x.dtype, num_heads)
    args = (xk,) + weights
    in_specs = [spec] + _weight_specs(quant)
    if use_rope:
        cos = jnp.asarray(rope_tables[0])[:n]
        sin = jnp.asarray(rope_tables[1])[:n]
        args = args + (cos, sin)
        in_specs += [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2

    if mode == "stripe":
        kernel = functools.partial(_full_block_stripe_kernel,
                                   num_heads=num_heads, ws=ws, nwj=nwj,
                                   use_rope=use_rope,
                                   sanitize_hw=sanitize_hw, quant=quant)
    else:
        kernel = functools.partial(_full_block_kernel, num_heads=num_heads,
                                   ws=ws, use_rope=use_rope, mode=mode,
                                   sanitize_hw=sanitize_hw, quant=quant)
    nw = nwj
    for g in grid:
        nw *= g
    hidden = p["mlp"]["w1"]["w"].shape[1]
    flops_w = (8 * n * c * c + 4 * n * n * c + 6 * n * c * hidden)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * len(grid),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=nw * flops_w,
            bytes_accessed=2 * nw * n * c * x.dtype.itemsize,
            transcendentals=nw * num_heads * n * n,
        ),
    )(*args)
    return unpack(out)


# ---------------------------------------------------------------------------
# token-compressed (ToC3D accelerated) block
# ---------------------------------------------------------------------------

def _rope_rows(g_slow, cos_t, sin_t, k_slow: int, has_rep: bool):
    """Per-compressed-row RoPE tables gathered ON the MXU: the slow rows of
    the gather matrix are already one-hot, and the representative row reads
    table row k_slow (the XLA path's rep_idx, toc3d_vit gather). Padding
    rows get zero tables (they are softmax-column-masked and
    scatter-dropped, so their rope values never matter)."""
    k_rows, n = g_slow.shape
    sel = g_slow.astype(jnp.float32)
    if has_rep:
        row = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 1)
        sel = sel + jnp.where((row == k_slow) & (col == k_slow),
                              jnp.float32(1.0), jnp.float32(0.0))
    cos = jax.lax.dot_general(sel, cos_t, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    sin = jax.lax.dot_general(sel, sin_t, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return cos, sin


def _compressed_block_kernel(x_ref, g_ref, cos_ref, sin_ref, *rest,
                             num_heads, ws, k_slow, n_valid, use_rope,
                             has_rep, mode, sanitize_hw=None, quant=False):
    names = _names(quant)
    wrefs = dict(zip(names, rest[:len(names)]))
    o_ref = rest[len(names)]
    n = ws * ws
    c = x_ref.shape[-1]
    x = _load_window(x_ref, mode, ws, sanitize_hw)
    g = g_ref[0]                                     # (k_rows, n)
    k_rows = g.shape[0]

    s = jax.lax.dot_general(g, x, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32).astype(x.dtype)
    if use_rope:
        rowm0 = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 0) < k_slow
        g_slow = jnp.where(rowm0, g, jnp.zeros_like(g))
        cos, sin = _rope_rows(g_slow, cos_t=cos_ref[:].astype(jnp.float32),
                              sin_t=sin_ref[:].astype(jnp.float32),
                              k_slow=k_slow, has_rep=has_rep)
    else:
        cos = sin = None

    h = _ln(s, wrefs["ln1s"][:], wrefs["ln1b"][:])
    raw1 = _attention(h, wrefs, num_heads, cos, sin, n_valid, s.dtype)
    s1 = s + raw1
    raw2 = _swiglu(_ln(s1, wrefs["ln2s"][:], wrefs["ln2b"][:]), wrefs)
    y = s1 + raw2

    # scatter slow rows (exclude the rep/merge row k and zero padding rows)
    rowm = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 0) < k_slow
    g_s = jnp.where(rowm, g, jnp.zeros_like(g))
    out_slow = jax.lax.dot_general(g_s, y, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    slow_cols = jnp.sum(g_s.astype(jnp.float32), axis=0)[:, None]  # (n, 1)

    if has_rep:
        rep_delta = (raw1[k_slow:k_slow + 1, :]
                     + raw2[k_slow:k_slow + 1, :]).astype(jnp.float32)
    else:
        rep_delta = jnp.zeros((1, c), jnp.float32)
    fast = (x.astype(jnp.float32) + rep_delta) * (1.0 - slow_cols)
    out = (out_slow + fast).astype(x.dtype)
    _store_window(o_ref, out, mode, ws)


def _compressed_block_stripe_kernel(x_ref, g_ref, cos_ref, sin_ref, *rest,
                                    num_heads, ws, nwj, k_slow, n_valid,
                                    use_rope, has_rep, sanitize_hw=None,
                                    quant=False):
    """Compressed block on a (1, ws, w, C) stripe: per-window MXU
    gather/scatter (G matmuls), LN/QKV/RoPE/O-proj/FFN batched over the
    stripe's nwj windows' compressed tokens, attention per window."""
    names = _names(quant)
    wrefs = dict(zip(names, rest[:len(names)]))
    o_ref = rest[len(names)]
    n = ws * ws
    xt = _stripe_tokens(x_ref, ws, nwj, sanitize_hw)      # (nwj*n, c)
    g = g_ref[0, 0]                                       # (nwj, k_rows, n)
    k_rows = g.shape[1]

    rowm0 = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 0) < k_slow
    ss, coss, sins = [], [], []
    for j in range(nwj):
        xj = xt[j * n:(j + 1) * n]
        ss.append(jax.lax.dot_general(
            g[j], xj, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(xt.dtype))
        if use_rope:
            g_slow = jnp.where(rowm0, g[j], jnp.zeros_like(g[j]))
            cj, sj = _rope_rows(g_slow, cos_t=cos_ref[:].astype(jnp.float32),
                                sin_t=sin_ref[:].astype(jnp.float32),
                                k_slow=k_slow, has_rep=has_rep)
            coss.append(cj)
            sins.append(sj)
    s = jnp.concatenate(ss, axis=0)                       # (nwj*k_rows, c)
    if use_rope:
        cos = jnp.concatenate(coss, axis=0)
        sin = jnp.concatenate(sins, axis=0)
    else:
        cos = sin = None

    h = _ln(s, wrefs["ln1s"][:], wrefs["ln1b"][:])
    raw1 = _attention_grouped(h, wrefs, num_heads, cos, sin, k_rows, nwj,
                              n_valid, s.dtype)
    s1 = s + raw1
    raw2 = _swiglu(_ln(s1, wrefs["ln2s"][:], wrefs["ln2b"][:]), wrefs)
    y = s1 + raw2

    rowm = jax.lax.broadcasted_iota(jnp.int32, (k_rows, n), 0) < k_slow
    outs = []
    for j in range(nwj):
        g_s = jnp.where(rowm, g[j], jnp.zeros_like(g[j]))
        yj = y[j * k_rows:(j + 1) * k_rows]
        out_slow = jax.lax.dot_general(g_s, yj, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
        slow_cols = jnp.sum(g_s.astype(jnp.float32), axis=0)[:, None]
        if has_rep:
            r0 = j * k_rows + k_slow
            rep_delta = (raw1[r0:r0 + 1, :]
                         + raw2[r0:r0 + 1, :]).astype(jnp.float32)
        else:
            rep_delta = jnp.zeros((1, xt.shape[-1]), jnp.float32)
        xj = xt[j * n:(j + 1) * n]
        fast = (xj.astype(jnp.float32) + rep_delta) * (1.0 - slow_cols)
        outs.append((out_slow + fast).astype(xt.dtype))
    _store_stripe(o_ref, jnp.concatenate(outs, axis=0), ws, nwj)


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def build_gather_matrix(slow_idx, fast_idx, fast_score, n: int, k_rows: int,
                        has_rep: bool, dtype):
    """Per-window gather matrix G (W, k_rows, n):
      rows 0..k-1: one-hot at slow_idx (token gather);
      row k (if has_rep): normalized fast scores scattered to fast_idx
        (merge_tokens weights, toc3d_utils.py:56-70);
      remaining rows: zero (sublane padding).
    """
    w, k = slow_idx.shape
    cols = jnp.arange(n, dtype=slow_idx.dtype)
    onehot = (slow_idx[..., None] == cols).astype(dtype)       # (W, k, n)
    rows = [onehot]
    if has_rep:
        denom = jnp.sum(fast_score, axis=1, keepdims=True)
        wgt = (fast_score / denom).astype(dtype)               # (W, n-k)
        merge = jnp.zeros((w, n), dtype).at[
            jnp.arange(w)[:, None], fast_idx].set(wgt)
        rows.append(merge[:, None, :])
    used = k + (1 if has_rep else 0)
    if k_rows > used:
        rows.append(jnp.zeros((w, k_rows - used, n), dtype))
    return jnp.concatenate(rows, axis=1)


def fused_compressed_block(p, x, scores, num_heads: int, window_size: int,
                           ratio: float, rope_tables, use_represent: bool,
                           rope_acc: bool, interpret=None,
                           align_k: bool = False):
    """Token-compressed ToC3D block as one kernel.

    x: (B, H, W, C); scores: (B, H*W) importance (log-prob channel 0).
    Math parity with models/toc3d_vit.py:toc3d_block_forward (reference
    toc3d_eva_vit.py:395-473). Returns (B, H, W, C).
    """
    from ...models.token_select import sample_topk, keep_count
    from ..window import window_partition

    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, w, c = x.shape
    ws = window_size
    n = ws * ws

    # per-window top-k on the (small) score tensor — stays in XLA
    sw, _ = window_partition(scores.reshape(b, h, w, 1), ws, pad_value=-1e6)
    nw = sw.shape[0]
    sw = sw.reshape(nw, n)
    k = keep_count(n, ratio, n_rep=1 if use_represent else 0,
                   mxu_align=align_k)
    slow_score, fast_score, slow_idx, fast_idx = sample_topk(sw, ratio, k=k)
    has_rep = use_represent and (n - k) > 0
    n_valid = k + 1 if has_rep else k
    sub = 16 if x.dtype == jnp.bfloat16 else 8
    k_rows = _round_up(n_valid, sub)

    g = build_gather_matrix(slow_idx, fast_idx, fast_score, n, k_rows,
                            has_rep, x.dtype)

    use_rope = rope_tables is not None and rope_acc
    d = c // num_heads
    if use_rope:
        # full (n, d) tables; the kernel gathers the per-row tables on the
        # MXU from the one-hot rows it already holds in G (_rope_rows) —
        # the XLA jnp.take gathers here cost ~0.7 ms each at 1600x800 and
        # their (W, k_rows, d) f32 results another HBM round trip
        cos = jnp.asarray(rope_tables[0])[:n].astype(jnp.float32)
        sin = jnp.asarray(rope_tables[1])[:n].astype(jnp.float32)
    else:
        cos = jnp.zeros((n, d), jnp.float32)
        sin = cos

    (mode, xk, grid, spec, shape, unpack, widx,
     sanitize_hw, nwj) = _layout_plan(x, ws,
                                      prefer_stripe=STRIPE_WS8_COMPRESSED)
    # RoPE tables are whole-array constants across the grid (gathered
    # in-kernel per window from G's one-hot rows)
    tspec = pl.BlockSpec(memory_space=pltpu.VMEM)
    if mode == "stripe":
        # one grid step covers a stripe of nwj windows: hand it all their
        # gather matrices at once (free leading-dim split)
        b_, nh_ = grid
        g = g.reshape(b_, nh_, nwj, k_rows, n)
        gspec = pl.BlockSpec((1, 1, nwj, k_rows, n),
                             lambda bb, i: (bb, i, 0, 0, 0),
                             memory_space=pltpu.VMEM)
    else:
        gspec = pl.BlockSpec((1, k_rows, n),
                             lambda *ids: (widx(*ids), 0, 0),
                             memory_space=pltpu.VMEM)

    quant = is_quantized(p)
    weights = _flatten_params(p, x.dtype, num_heads)
    if mode == "stripe":
        kernel = functools.partial(_compressed_block_stripe_kernel,
                                   num_heads=num_heads, ws=ws, nwj=nwj,
                                   k_slow=k, n_valid=n_valid,
                                   use_rope=use_rope, has_rep=has_rep,
                                   sanitize_hw=sanitize_hw, quant=quant)
    else:
        kernel = functools.partial(_compressed_block_kernel,
                                   num_heads=num_heads,
                                   ws=ws, k_slow=k, n_valid=n_valid,
                                   use_rope=use_rope, has_rep=has_rep,
                                   mode=mode, sanitize_hw=sanitize_hw,
                                   quant=quant)
    hidden = p["mlp"]["w1"]["w"].shape[1]
    flops_w = (8 * k_rows * c * c + 4 * k_rows * k_rows * c
               + 6 * k_rows * c * hidden + 4 * k_rows * n * c)
    ntot = nwj
    for gdim in grid:
        ntot *= gdim
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[spec, gspec, tspec, tspec] + _weight_specs(quant),
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct(shape, x.dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",) * len(grid),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=ntot * flops_w,
            bytes_accessed=2 * ntot * n * c * x.dtype.itemsize,
            transcendentals=ntot * num_heads * k_rows * k_rows,
        ),
    )(xk, g, cos, sin, *weights)
    return unpack(out)


# ---------------------------------------------------------------------------
# trainable wrappers: Pallas forward, exact XLA backward (custom VJP)
# ---------------------------------------------------------------------------
#
# The kernels have no hand-written backward; instead the VJP re-derives
# gradients through the XLA-path block implementation at the saved inputs
# (remat-with-a-faster-primal semantics: the primal comes from the fused
# kernel, the cotangents are exactly the XLA path's). This unlocks the
# kernel win for the training forward pass while keeping autodiff exact.

def make_injected_op(xla_fn):
    """Two-program training split (VERDICT r3 #3): primal = a PRECOMPUTED
    output `o` (produced by a separate, non-differentiated program that runs
    the Pallas kernels), backward = the exact XLA vjp linearized at the
    traced operands. The differentiated program then contains no Pallas
    custom calls (the axon kernel-fault configuration) yet its forward
    VALUES are the kernel's.

    f(o, *args) -> o, with grads d(xla_fn(*args))/d(args) flowing to args
    and zero cotangent to o. Semantics: forward values come from the fast
    kernels, the backward is linearized at the same inputs through the XLA
    path — the identical contract make_trainable_full_block provides inside
    one program, relocated across the program split."""

    @jax.custom_vjp
    def f(o, *args):
        return o

    def fwd(o, *args):
        return o, args

    def bwd(res, g):
        _, vjp = jax.vjp(xla_fn, *res)
        return (jnp.zeros_like(g),) + vjp(g)

    f.defvjp(fwd, bwd)
    return f


def make_trainable_full_block(xla_fn, num_heads: int, window_size: int):
    """xla_fn(p, x, tables) -> y: the XLA-path block used for the backward.
    Returns f(p, x, tables) with a custom VJP; tables is the () or
    (cos, sin) RoPE pair passed as an explicit operand — closing over it
    would capture a tracer when the wrapper is built inside a remat trace
    (jax.checkpoint in the train step) and leak it into later layers."""

    @jax.custom_vjp
    def f(p, x, tables):
        return fused_full_block(p, x, num_heads, window_size,
                                tables if tables else None)

    def fwd(p, x, tables):
        return f(p, x, tables), (p, x, tables)

    def bwd(res, g):
        p, x, tables = res
        _, vjp = jax.vjp(lambda p_, x_: xla_fn(p_, x_, tables), p, x)
        dp, dx = vjp(g)
        return dp, dx, jax.tree_util.tree_map(jnp.zeros_like, tables)

    f.defvjp(fwd, bwd)
    return f


def make_trainable_compressed_block(xla_fn, num_heads: int,
                                    window_size: int, ratio: float,
                                    use_represent: bool, rope_acc: bool,
                                    align_k: bool = False):
    """Same pattern for the token-compressed block; scores participate in
    the gradient (token-selection supervision flows through the soft mask,
    not the hard routing, so the XLA-path vjp is the reference gradient).
    RoPE tables are an explicit operand for the same remat-leak reason as
    make_trainable_full_block."""

    @jax.custom_vjp
    def f(p, x, scores, tables):
        return fused_compressed_block(p, x, scores, num_heads, window_size,
                                      ratio, tables if tables else None,
                                      use_represent=use_represent,
                                      rope_acc=rope_acc, align_k=align_k)

    def fwd(p, x, scores, tables):
        return f(p, x, scores, tables), (p, x, scores, tables)

    def bwd(res, g):
        p, x, scores, tables = res
        _, vjp = jax.vjp(lambda p_, x_, s_: xla_fn(p_, x_, s_, tables),
                         p, x, scores)
        dp, dx, ds = vjp(g)
        return dp, dx, ds, jax.tree_util.tree_map(jnp.zeros_like, tables)

    f.defvjp(fwd, bwd)
    return f
