"""Motion Query-guided Token Selection — TPU-native, static shapes.

Capability parity target: reference
  projects/mmdet3d_plugin/models/backbones/toc3d_utils.py
  (ScoreBasedTokenSelector:90, NaiveQueryGuidedTokenSelector:192,
   MotionAwareQueryGuidedTokenSelector:298).

TPU-first deltas from the reference (documented divergences):
  * First-frame fallback is a branchless per-lane blend
    score = mlp_score*(1-prev) + query_score*prev — same math the reference
    uses at train time (toc3d_utils.py:266), here also used at eval instead of
    a python branch so the whole step stays inside one jit. The reference's
    train-time blend reads lane-0's prev_exists for every lane
    (petr3d.py:122); we blend per-lane.
  * The reference samples gumbel noise for the soft mask even at eval
    (toc3d_utils.py:146-147, hard_score defaults False), making eval
    stochastic. We use the noiseless softmax at eval (deterministic, equal in
    expectation) and gumbel only when a PRNG key is provided (training).
  * top-k selection uses a single descending sort (jax.lax.sort) per row —
    keep = first k, drop = rest, both score-sorted like torch.sort(desc).
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..layers import (init_layer_norm, layer_norm, init_linear, linear,
                      init_mln, mln)
from ..ops.posenc import pos2posemb3d, pos2posemb1d, nerf_positional_encoding

LN_EPS = 1e-5  # selector LNs are torch defaults


@dataclass(frozen=True)
class SelectorConfig:
    embed_dim: int = 1024
    query_dim: int = 256
    num_queries: int = 64
    ratio: float = 0.5
    attn_scale: bool = True
    use_mask: bool = True
    score_type: str = "attention"  # 'attention' | 'score'
    pc_range: Tuple[float, ...] = (-51.2, -51.2, -5.0, 51.2, 51.2, 3.0)


# ---------------------------------------------------------------------------
# params
# ---------------------------------------------------------------------------

def init_score_mlp(key, embed_dim):
    """The score-based (first-frame) MLP selector head."""
    k = jax.random.split(key, 5)
    return {
        "in_ln": init_layer_norm(embed_dim),
        "in_fc": init_linear(k[0], embed_dim, embed_dim),
        "out_fc0": init_linear(k[1], embed_dim, embed_dim // 2),
        "out_fc1": init_linear(k[2], embed_dim // 2, embed_dim // 4),
        "out_fc2": init_linear(k[3], embed_dim // 4, 2),
    }


def init_selector(key, cfg: SelectorConfig):
    k = jax.random.split(key, 10)
    p = {
        "score_mlp": init_score_mlp(k[0], cfg.embed_dim),
        "input_proj": init_linear(k[1], cfg.embed_dim, cfg.query_dim),
        # motion-aware conditioning
        "query_embedding": {
            "fc0": init_linear(k[3], cfg.query_dim * 3 // 2, cfg.query_dim),
            "fc1": init_linear(k[4], cfg.query_dim, cfg.query_dim),
        },
        "ego_pose_pe": init_mln(k[5], 180, cfg.query_dim),
        "ego_pose_queries": init_mln(k[6], 180, cfg.query_dim),
        "time_embedding": {
            "fc": init_linear(k[7], cfg.query_dim, cfg.query_dim),
            "ln": init_layer_norm(cfg.query_dim),
        },
    }
    if cfg.score_type == "attention":
        p["aggregate"] = init_linear(k[2], cfg.num_queries, 2)
    elif cfg.score_type == "score":
        p["aggregate"] = {
            "lin1": init_linear(k[2], 2 * cfg.query_dim, cfg.query_dim),
            "lin2": init_linear(k[8], cfg.query_dim, 2),
        }
    else:
        raise ValueError(cfg.score_type)
    return p


# ---------------------------------------------------------------------------
# scoring
# ---------------------------------------------------------------------------

def score_mlp_forward(p, x):
    """x: (B, N, C) masked tokens -> (B, N, 2) log-softmax scores.

    Mirrors ScoreBasedTokenSelector.score (toc3d_utils.py:114-129):
    local half-features + global mean of the other half.
    """
    h = linear(p["in_fc"], layer_norm(p["in_ln"], x, eps=LN_EPS))
    h = jax.nn.gelu(h, approximate=False)
    c = h.shape[-1]
    local = h[..., : c // 2]
    global_ = jnp.mean(h[..., c // 2:], axis=1, keepdims=True)
    g = jnp.broadcast_to(global_, local.shape)
    h = jnp.concatenate([local, g], axis=-1)
    h = jax.nn.gelu(linear(p["out_fc0"], h), approximate=False)
    h = jax.nn.gelu(linear(p["out_fc1"], h), approximate=False)
    logits = linear(p["out_fc2"], h)
    return jax.nn.log_softmax(logits, axis=-1)


def get_motion_aware_queries(p, cfg: SelectorConfig, temp_queries,
                             temp_ref_points, temp_vel, temp_timestamp,
                             temp_ego_pose, ego_pose_inv):
    """Condition history queries on motion (toc3d_utils.py:334-360).

    temp_queries: (B, Q, Cq); temp_ref_points: (B, Q, 3) global coords;
    temp_vel: (B, Q, 2); temp_timestamp: (B, Q, 1);
    temp_ego_pose: (B, Q, 4, 4); ego_pose_inv: (B, 4, 4).
    """
    from ..core.boxes import transform_reference_points

    pc = jnp.asarray(cfg.pc_range, jnp.float32)
    ref = transform_reference_points(temp_ref_points, ego_pose_inv)
    ref = (ref - pc[:3]) / (pc[3:6] - pc[:3])
    pos = pos2posemb3d(ref, num_pos_feats=cfg.query_dim // 2)
    pos = linear(p["query_embedding"]["fc1"],
                 jax.nn.relu(linear(p["query_embedding"]["fc0"], pos)))

    ego_motion = jnp.concatenate(
        [temp_vel, temp_timestamp,
         temp_ego_pose[..., :3, :].reshape(*temp_ego_pose.shape[:-2], 12)],
        axis=-1).astype(jnp.float32)
    ego_motion = nerf_positional_encoding(ego_motion)
    pos = mln(p["ego_pose_pe"], pos, ego_motion)
    te = linear(p["time_embedding"]["fc"],
                pos2posemb1d(temp_timestamp, num_pos_feats=cfg.query_dim))
    pos = pos + layer_norm(p["time_embedding"]["ln"], te, eps=LN_EPS)

    q = mln(p["ego_pose_queries"], temp_queries, ego_motion)
    return q + pos


def query_based_score(p, cfg: SelectorConfig, tokens, queries):
    """tokens: (BN, N, C); queries: (B, Q, Cq) broadcast over views.

    Returns (BN, N, 2) log-softmax scores (toc3d_utils.py:232-252).
    """
    bn = tokens.shape[0]
    b = queries.shape[0]
    x = linear(p["input_proj"], tokens)                       # (BN, N, Cq)
    q = jnp.repeat(queries, bn // b, axis=0)                   # (BN, Q, Cq)
    scale = cfg.query_dim ** -0.5 if cfg.attn_scale else 1.0
    if cfg.score_type == "attention":
        attn = jnp.einsum("bnc,bqc->bnq", x, q,
                          preferred_element_type=jnp.float32) * scale
        logits = linear(p["aggregate"], attn.astype(x.dtype))
        return jax.nn.log_softmax(logits, axis=-1), attn
    # 'score': concat token with mean query embedding, MLP to 2
    mean_q = jnp.mean(q, axis=1, keepdims=True)
    mean_q = jnp.broadcast_to(mean_q, x.shape)
    h = jnp.concatenate([x, mean_q], axis=-1)
    h = jax.nn.gelu(linear(p["aggregate"]["lin1"], h), approximate=False)
    logits = linear(p["aggregate"]["lin2"], h)
    return jax.nn.log_softmax(logits, axis=-1), None


def selector_score(p, cfg: SelectorConfig, tokens_hw, mask, motion_ctx,
                   prev_exists, train_blend: bool = False):
    """Full motion-aware scoring with first-frame fallback blend.

    tokens_hw: (BN, H, W, C); mask: (BN, H, W, 1) soft mask or None;
    motion_ctx: dict with temp_queries/ref_points/vel/timestamp/ego_pose (B-
    leading) and ego_pose_inv; prev_exists: (B,) float {0,1}.
    Returns scores (BN, H*W) [channel 0 of log-softmax], full (BN, H*W, 2),
    and the token-query attention map (or None).
    """
    bn, h, w, c = tokens_hw.shape
    use_mask = cfg.use_mask and mask is not None
    mask_flat = (mask.reshape(bn, h * w, 1).astype(tokens_hw.dtype)
                 if use_mask else None)
    x_raw = tokens_hw.reshape(bn, h * w, c)
    x = x_raw * mask_flat if use_mask else x_raw

    queries = get_motion_aware_queries(
        p, cfg, motion_ctx["temp_queries"], motion_ctx["temp_ref_points"],
        motion_ctx["temp_vel"], motion_ctx["temp_timestamp"],
        motion_ctx["temp_ego_pose"], motion_ctx["ego_pose_inv"])
    q_score, attn = query_based_score(p, cfg, x, queries)

    b = prev_exists.shape[0]
    pe = prev_exists.reshape(b, 1, 1, 1).astype(q_score.dtype)
    pe = jnp.broadcast_to(pe, (b, bn // b, 1, 1)).reshape(bn, 1, 1)

    # The score-MLP fallback only contributes on first frames (pe=0 lanes);
    # in steady-state streaming every lane has pe=1 and the blend returns
    # q_score exactly, so skip the 30k-token MLP at runtime via lax.cond
    # (the reference python-branches on the same flag, toc3d_utils.py:262).
    # Operands are the RAW token buffer + the small mask, NOT the masked
    # product: a cond operand must materialize, and handing it x*mask cost
    # a full-feature-map fused multiply-write (~60 MB x 2/selector) every
    # steady-state frame — the mask multiply now lives inside the
    # first-frame branch (for q_score it fuses into the input_proj matmul).
    def _with_mlp(arg):
        x_raw_, mask_, q_ = arg
        x_ = x_raw_ * mask_ if use_mask else x_raw_
        mlp_score = score_mlp_forward(p["score_mlp"], x_)      # (BN, N, 2)
        if train_blend:
            # reference train-time blend keeps only channel 0 of the mlp
            # score (toc3d_utils.py:264-266) — broadcast over both channels
            return mlp_score[..., :1] * (1.0 - pe) + q_ * pe
        # eval first-frame fallback uses the full 2-channel mlp score
        # (toc3d_utils.py:269-273); blended per-lane so mixed batches stay
        # exact
        return mlp_score * (1.0 - pe) + q_ * pe

    def _steady(arg):
        return arg[2]

    operand = (x_raw, mask_flat if use_mask else jnp.ones((), x_raw.dtype),
               q_score)
    pred = jax.lax.cond(jnp.all(prev_exists > 0), _steady, _with_mlp,
                        operand)
    return pred[..., 0], pred, attn


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def keep_count(n: int, ratio: float, n_rep: int = 0,
               mxu_align: bool = False) -> int:
    """Static keep count for a window of n tokens.

    Reference semantics: k = int(n * ratio) (toc3d_utils.py:131-143).
    mxu_align (TPU-first divergence, ToC3DViTConfig.mxu_align_k): when the
    attended row count k + n_rep lands exactly ONE over a 128-lane MXU tile
    (k + n_rep ≡ 1 mod 128), drop one token. The canonical case is
    ws=16 / ratio=0.5: k+1 = 129 rows pad to 144x256 in the compressed
    kernel's attention (2x padded lanes, +12% padded rows); 128 rows tile
    exactly. The dropped 128th-ranked token still reaches the slow path
    through the representative-token merge. Measured profile motivation:
    PERF.md ViT-B section."""
    k = int(n * ratio)
    if mxu_align and k > 1 and (k + n_rep) % 128 == 1:
        k -= 1
    return k


def sample_topk(scores, ratio: float, k: Optional[int] = None):
    """scores: (B, N) -> keep/drop (scores, idx) via full descending sort.

    keep count = int(N * ratio) — static (toc3d_utils.py:131-143) — unless
    an explicit k overrides it (keep_count with mxu_align).
    """
    n = scores.shape[-1]
    if k is None:
        k = int(n * ratio)
    neg = -scores
    sorted_neg, sorted_idx = jax.lax.sort_key_val(neg, _iota_like(scores), dimension=-1)
    sorted_score = -sorted_neg
    return (sorted_score[..., :k], sorted_score[..., k:],
            sorted_idx[..., :k], sorted_idx[..., k:])


def _iota_like(x):
    return jnp.broadcast_to(
        jax.lax.broadcasted_iota(jnp.int32, x.shape, x.ndim - 1), x.shape)


def soft_mask(pred_score, rng=None, tau: float = 1.0):
    """Differentiable keep-probability mask, channel 0 of gumbel-softmax.

    rng=None -> noiseless softmax (deterministic eval path).
    """
    logits = pred_score
    if rng is not None:
        g = jax.random.gumbel(rng, logits.shape, dtype=jnp.float32)
        logits = logits.astype(jnp.float32) + g
    return jax.nn.softmax(logits / tau, axis=-1)[..., 0:1].astype(pred_score.dtype)
