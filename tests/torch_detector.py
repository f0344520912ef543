"""Torch restatement of the ENTIRE ToC3D inference path, consuming a
reference-named state dict (tests/test_full_converter.build_reference_state_dict)
directly — the strongest accuracy-parity oracle obtainable without data.

Mirrors the reference eval path end to end:
  Petr3D.simple_test (petr3d.py:543-594):
    ToC3DEVAViT backbone w/ motion-aware token selection
    (toc3d_eva_vit.py + toc3d_utils.py) -> CPFPN (cp_fpn.py) ->
    StreamPETRHead w/ streaming memory (streampetr_head.py:604-680) ->
    NMSFreeCoder decode (nms_free_coder.py:39-111).

Pure functions over the numpy state dict + torch ops; the temporal memory is
an explicit dict threaded between frames (the reference mutates module
attributes). All math f32, eval mode (no dropout / droppath / gumbel noise;
token mask = noiseless softmax channel 0, matching the JAX default).
"""
import math

import numpy as np
import torch
import torch.nn.functional as F


def T(a):
    return torch.from_numpy(np.asarray(a, np.float32))


def lin(sd, name, x, bias=True):
    b = T(sd[name + ".bias"]) if bias and (name + ".bias") in sd else None
    return F.linear(x, T(sd[name + ".weight"]), b)


def ln(sd, name, x, eps=1e-6):
    d = x.shape[-1]
    return F.layer_norm(x, (d,), T(sd[name + ".weight"]),
                        T(sd[name + ".bias"]), eps)


def mln(sd, name, x, c, eps=1e-5):
    x = F.layer_norm(x, (x.shape[-1],), eps=eps)
    c = F.relu(lin(sd, name + ".reduce.0", c))
    return lin(sd, name + ".gamma", c) * x + lin(sd, name + ".beta", c)


def se(sd, name, x, x_se):
    g = F.relu(lin(sd, name + ".conv_reduce", x_se))
    g = lin(sd, name + ".conv_expand", g)
    return x * torch.sigmoid(g)


def mlp_relu2(sd, n0, n1, x):
    return lin(sd, n1, F.relu(lin(sd, n0, x)))


def inverse_sigmoid(x, eps=1e-5):
    x = x.clamp(0.0, 1.0)
    return torch.log(x.clamp(min=eps) / (1 - x).clamp(min=eps))


def rotate_half(x):
    x = x.reshape(*x.shape[:-1], -1, 2)
    out = torch.stack([-x[..., 1], x[..., 0]], dim=-1)
    return out.reshape(*out.shape[:-2], -1)


# ---------------------------------------------------------------------------
# positional encodings (positional_encoding.py:14-81)
# ---------------------------------------------------------------------------

def sine_embed(x, num_pos_feats, temperature=10000):
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor")
                            / num_pos_feats)
    pos = x[..., None] / dim_t
    emb = torch.stack([pos[..., 0::2].sin(), pos[..., 1::2].cos()], dim=-1)
    return emb.reshape(*emb.shape[:-2], -1)


def pos2posemb3d(pos, num_pos_feats=128):
    pos = pos * (2 * math.pi)
    return torch.cat([sine_embed(pos[..., 1], num_pos_feats),
                      sine_embed(pos[..., 0], num_pos_feats),
                      sine_embed(pos[..., 2], num_pos_feats)], dim=-1)


def pos2posemb1d(pos, num_pos_feats=256):
    return sine_embed(pos[..., 0] * (2 * math.pi), num_pos_feats)


def nerf_enc(x, n=6):
    enc = []
    freqs = 2.0 ** torch.linspace(0.0, n - 1, n)
    for i in range(n):
        enc += [torch.sin(x * freqs[i]), torch.cos(x * freqs[i])]
    return torch.cat(enc, dim=-1)


# ---------------------------------------------------------------------------
# backbone (eva_vit.py, toc3d_eva_vit.py, toc3d_utils.py)
# ---------------------------------------------------------------------------

def window_partition(x, ws):
    b, h, w, c = x.shape
    ph, pw = (ws - h % ws) % ws, (ws - w % ws) % ws
    if ph or pw:
        x = F.pad(x, (0, 0, 0, pw, 0, ph))
    hp, wp = h + ph, w + pw
    x = x.view(b, hp // ws, ws, wp // ws, ws, c).permute(0, 1, 3, 2, 4, 5)
    return x.reshape(-1, ws, ws, c), (hp, wp)


def window_unpartition(xw, ws, padded, hw):
    hp, wp = padded
    h, w = hw
    b = xw.shape[0] // ((hp // ws) * (wp // ws))
    x = xw.view(b, hp // ws, wp // ws, ws, ws, -1).permute(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, -1)
    return x[:, :h, :w]


def eva_attention(sd, pre, x, heads, cos=None, sin=None, sel_idx=None):
    """x: (B, N, C). EVA attention with q/v bias, optional RoPE (gathered at
    sel_idx for compressed paths). eva_vit.py:54-119."""
    if cos is not None:
        cos, sin = T(cos), T(sin)
    b, n, c = x.shape
    d = c // heads
    q = F.linear(x, T(sd[pre + "attn.q_proj.weight"]),
                 T(sd[pre + "attn.q_bias"]))
    k = F.linear(x, T(sd[pre + "attn.k_proj.weight"]))
    v = F.linear(x, T(sd[pre + "attn.v_proj.weight"]),
                 T(sd[pre + "attn.v_bias"]))
    q = q.view(b, n, heads, d).permute(0, 2, 1, 3)
    k = k.view(b, n, heads, d).permute(0, 2, 1, 3)
    v = v.view(b, n, heads, d).permute(0, 2, 1, 3)
    if cos is not None:
        if sel_idx is not None:
            tc = cos[sel_idx][:, None]          # (B, 1, N, D)
            ts = sin[sel_idx][:, None]
        else:
            tc, ts = cos[:n], sin[:n]
        q = q * tc + rotate_half(q) * ts
        k = k * tc + rotate_half(k) * ts
    attn = (q * d ** -0.5) @ k.transpose(-2, -1)
    attn = attn.softmax(dim=-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(b, n, c)
    return lin(sd, pre + "attn.proj", out)


def swiglu(sd, pre, x):
    x1 = lin(sd, pre + "mlp.w1", x)
    x2 = lin(sd, pre + "mlp.w2", x)
    hidden = ln(sd, pre + "mlp.ffn_ln", F.silu(x1) * x2)
    return lin(sd, pre + "mlp.w3", hidden)


def eva_block(sd, pre, x, ws, heads, cos, sin):
    """Plain windowed block (eva_vit.py:226-266). x: (B, H, W, C)."""
    b, h, w, c = x.shape
    shortcut = x
    x = ln(sd, pre + "norm1", x)
    xw, padded = window_partition(x, ws)
    n = ws * ws
    xw = eva_attention(sd, pre, xw.reshape(-1, n, c), heads, cos, sin)
    x = window_unpartition(xw.reshape(-1, ws, ws, c), ws, padded, (h, w))
    x = shortcut + x
    return x + swiglu(sd, pre, ln(sd, pre + "norm2", x))


def toc3d_block(sd, pre, x, scores, ws, ratio, heads, cos, sin,
                use_rep=True):
    """Token-compressed block (toc3d_eva_vit.py:329-473). x: (B, H, W, C);
    scores: (B, H*W)."""
    b, h, w, c = x.shape
    xw, padded = window_partition(x, ws)
    swin, _ = window_partition(
        F.pad(scores.view(b, h, w, 1), (0, 0), value=0.0), ws)
    # score pad must be -1e6 (never selected); repartition with pad value
    ph, pw = padded[0] - h, padded[1] - w
    sc = scores.view(b, h, w, 1)
    if ph or pw:
        sc = F.pad(sc, (0, 0, 0, pw, 0, ph), value=-1e6)
    swin = sc.view(b, padded[0] // ws, ws, padded[1] // ws, ws, 1)
    swin = swin.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws)

    nw, n = swin.shape
    xw = xw.reshape(nw, n, c)
    k = int(n * ratio)
    sorted_s, sorted_i = torch.sort(swin, dim=1, descending=True,
                                    stable=True)
    slow_idx, fast_idx = sorted_i[:, :k], sorted_i[:, k:]
    fast_score = sorted_s[:, k:]

    gat = lambda t, idx: torch.gather(
        t, 1, idx[..., None].expand(-1, -1, c))
    slow = gat(xw, slow_idx)
    fast = gat(xw, fast_idx)

    has_rep = use_rep and fast.shape[1] > 0
    if has_rep:
        wgt = fast_score / fast_score.sum(dim=1, keepdim=True)
        rep = (wgt[..., None] * fast).sum(dim=1, keepdim=True)
        slow = torch.cat([slow, rep], dim=1)
        rep_i = torch.full((nw, 1), k, dtype=slow_idx.dtype)
        sel = torch.cat([slow_idx, rep_i], dim=-1)
    else:
        sel = slow_idx

    shortcut = slow
    hdn = ln(sd, pre + "norm1", slow)
    raw1 = eva_attention(sd, pre, hdn, heads, cos, sin, sel_idx=sel)
    slow = shortcut + raw1
    raw2 = swiglu(sd, pre, ln(sd, pre + "norm2", slow))
    slow = slow + raw2

    if has_rep:
        slow, rep1, rep2 = slow[:, :-1], raw1[:, -1:], raw2[:, -1:]
        fast = fast + rep1 + rep2

    out = torch.zeros_like(xw)
    out.scatter_(1, slow_idx[..., None].expand(-1, -1, c), slow)
    out.scatter_(1, fast_idx[..., None].expand(-1, -1, c), fast)
    return window_unpartition(out.reshape(nw, ws, ws, c), ws, padded, (h, w))


def score_mlp(sd, pre, x):
    """ScoreBasedTokenSelector.score (toc3d_utils.py:114-129)."""
    h = F.gelu(lin(sd, pre + "in_conv.1", ln(sd, pre + "in_conv.0", x,
                                             eps=1e-5)))
    c = h.shape[-1]
    local = h[..., :c // 2]
    glob = h[..., c // 2:].mean(dim=1, keepdim=True).expand_as(local)
    h = torch.cat([local, glob], dim=-1)
    h = F.gelu(lin(sd, pre + "out_conv.0", h))
    h = F.gelu(lin(sd, pre + "out_conv.2", h))
    return F.log_softmax(lin(sd, pre + "out_conv.4", h), dim=-1)


def motion_queries(sd, pre, ctx, pc_range, qdim):
    """MotionAwareQueryGuidedTokenSelector conditioning
    (toc3d_utils.py:334-360)."""
    pc = torch.tensor(pc_range, dtype=torch.float32)
    ref = transform_points(ctx["temp_ref_points"], ctx["ego_pose_inv"])
    ref = (ref - pc[:3]) / (pc[3:6] - pc[:3])
    pos = pos2posemb3d(ref, num_pos_feats=qdim // 2)
    pos = mlp_relu2(sd, pre + "query_embedding.0", pre + "query_embedding.2",
                    pos)
    motion = torch.cat(
        [ctx["temp_vel"], ctx["temp_timestamp"],
         ctx["temp_ego_pose"][..., :3, :].reshape(
             *ctx["temp_ego_pose"].shape[:-2], 12)], dim=-1)
    motion = nerf_enc(motion)
    pos = mln(sd, pre + "ego_pose_pe", pos, motion)
    te = lin(sd, pre + "time_embedding.0",
             pos2posemb1d(ctx["temp_timestamp"], num_pos_feats=qdim))
    pos = pos + ln(sd, pre + "time_embedding.1", te, eps=1e-5)
    q = mln(sd, pre + "ego_pose_queries", ctx["temp_queries"], motion)
    return q + pos


def selector_scores(sd, pre, tokens_hw, mask, ctx, prev_exists, pc_range,
                    qdim, num_queries):
    """Full scoring + first-frame blend (toc3d_utils.py:232-273; eval path:
    full 2-channel mlp fallback, noiseless mask)."""
    bn, h, w, c = tokens_hw.shape
    x = tokens_hw
    if mask is not None:
        x = x * mask
    x = x.reshape(bn, h * w, c)
    mlp_s = score_mlp(sd, pre, x)

    queries = motion_queries(sd, pre, ctx, pc_range, qdim)
    b = queries.shape[0]
    xq = lin(sd, pre + "input_proj.0", x)
    q = queries.repeat_interleave(bn // b, dim=0)
    attn = torch.einsum("bnc,bqc->bnq", xq, q) * qdim ** -0.5
    q_s = F.log_softmax(lin(sd, pre + "aggregate.0", attn), dim=-1)

    pe = prev_exists.view(b, 1, 1, 1).expand(b, bn // b, 1, 1).reshape(bn, 1, 1)
    pred = mlp_s * (1 - pe) + q_s * pe
    return pred[..., 0], pred


def abs_pos(sd, hw):
    """get_abs_pos (eva_utils.py:229-258)."""
    p = T(sd["img_backbone.pos_embed"])[:, 1:]
    n = p.shape[1]
    size = int(round(math.sqrt(n)))
    h, w = hw
    if size == h and size == w:
        return p.reshape(1, h, w, -1)
    grid = p.reshape(1, size, size, -1).permute(0, 3, 1, 2)
    grid = F.interpolate(grid, size=(h, w), mode="bicubic",
                         align_corners=False)
    return grid.permute(0, 2, 3, 1)


def backbone_forward(sd, cfg, x, ctx, prev_exists, rope_tables):
    """ToC3DEVAViT.forward eval path. x: (BN, H, W, 3)."""
    b = cfg.backbone
    (cos_w, sin_w), (cos_g, sin_g) = rope_tables
    x = F.conv2d(x.permute(0, 3, 1, 2),
                 T(sd["img_backbone.patch_embed.proj.weight"]),
                 T(sd["img_backbone.patch_embed.proj.bias"]),
                 stride=b.patch_size).permute(0, 2, 3, 1)
    x = x + abs_pos(sd, (x.shape[1], x.shape[2]))

    bn, h, w, c = x.shape
    masks = torch.ones(bn, h, w, 1)
    scores = None
    seg = 0
    ratio = None
    for i in range(b.depth):
        if i in b.pruning_loc:
            pre = f"img_backbone.score_predictor.{seg}."
            scores, pred = selector_scores(
                sd, pre, x, masks, ctx, prev_exists, b.pc_range, b.query_dim,
                b.pruning_num_queries)
            masks = pred.softmax(dim=-1)[..., 0:1].reshape(bn, h, w, 1)
            ratio = b.token_ratio[seg]
            seg += 1
        is_global = i in b.global_attn_indexes
        ws = b.global_window_size if is_global else b.window_size
        cos, sin = (cos_g, sin_g) if is_global else (cos_w, sin_w)
        pre = f"img_backbone.blocks.{i}."
        accel = (b.pruning_loc and i >= b.pruning_loc[0]
                 and (not is_global or b.accelerate_global))
        if accel:
            x = toc3d_block(sd, pre, x, scores, ws, ratio, b.num_heads,
                            cos, sin, use_rep=b.use_represent_tokens)
        else:
            x = eva_block(sd, pre, x, ws, b.num_heads, cos, sin)
    return x


# ---------------------------------------------------------------------------
# neck + head (cp_fpn.py, streampetr_head.py)
# ---------------------------------------------------------------------------

def neck_forward(sd, x):
    lat = F.conv2d(x.permute(0, 3, 1, 2),
                   T(sd["img_neck.lateral_convs.0.conv.weight"]),
                   T(sd["img_neck.lateral_convs.0.conv.bias"]))
    out = F.conv2d(lat, T(sd["img_neck.fpn_convs.0.conv.weight"]),
                   T(sd["img_neck.fpn_convs.0.conv.bias"]), padding=1)
    return out.permute(0, 2, 3, 1)


def transform_points(pts, mat):
    pts1 = torch.cat([pts, torch.ones_like(pts[..., :1])], dim=-1)
    return torch.einsum("bij,bnj->bni", mat, pts1)[..., :3]


def init_memory_t(b, cfg):
    h = cfg.head
    return {"embedding": torch.zeros(b, h.memory_len, h.embed_dims),
            "reference_point": torch.zeros(b, h.memory_len, 3),
            "timestamp": torch.zeros(b, h.memory_len, 1),
            "egopose": torch.zeros(b, h.memory_len, 4, 4),
            "velo": torch.zeros(b, h.memory_len, 2)}


def pre_update(sd, cfg, mem, timestamp, ego_pose_inv, prev_exists):
    """streampetr_head.py:322-346."""
    h = cfg.head
    x = prev_exists.view(-1, 1, 1)
    b = x.shape[0]
    ts = (mem["timestamp"] + timestamp.view(b, 1, 1)) * x
    ego = torch.einsum("bij,bljk->blik", ego_pose_inv, mem["egopose"])
    ego = ego * x.view(b, 1, 1, 1)
    ref = transform_points(mem["reference_point"], ego_pose_inv) * x
    emb = mem["embedding"] * x
    velo = mem["velo"] * x
    if h.num_propagated > 0:
        pc = torch.tensor(h.pc_range, dtype=torch.float32)
        pseudo = (T(sd["pts_bbox_head.pseudo_reference_points.weight"])
                  * (pc[3:6] - pc[:3]) + pc[:3])
        p = h.num_propagated
        ref[:, :p] = ref[:, :p] + (1 - x) * pseudo
        ego[:, :p] = ego[:, :p] + (1 - x).view(b, 1, 1, 1) * torch.eye(4)
    return {"embedding": emb, "reference_point": ref, "timestamp": ts,
            "egopose": ego, "velo": velo}


def position_embedding(sd, cfg, data, hw):
    """streampetr_head.py:379-422 with the intrinsic tile quirk."""
    h = cfg.head
    eps = 1e-5
    b, n = data["intrinsics"].shape[:2]
    fh, fw = hw
    hw_n = fh * fw
    pad_h, pad_w = cfg.pad_shape

    intr = torch.stack([data["intrinsics"][..., 0, 0],
                        data["intrinsics"][..., 1, 1]], dim=-1).abs() / 1e3
    intr = intr[:, None].expand(b, hw_n, n, 2).reshape(b, hw_n * n, 2)

    sx = (torch.arange(fw, dtype=torch.float32) * h.stride
          + h.stride // 2) / pad_w
    sy = (torch.arange(fh, dtype=torch.float32) * h.stride
          + h.stride // 2) / pad_h
    gy, gx = torch.meshgrid(sy, sx, indexing="ij")
    centers = torch.stack([gx, gy], dim=-1)
    centers_px = centers * torch.tensor([pad_w, pad_h], dtype=torch.float32)
    centers_px = centers_px.reshape(1, 1, hw_n, 2).expand(
        b, n, hw_n, 2).reshape(b, n * hw_n, 1, 2)

    index = torch.arange(h.depth_num, dtype=torch.float64)
    if h.LID:
        bs = (h.position_range[3] - h.depth_start) / (
            h.depth_num * (1 + h.depth_num))
        coords_d = (h.depth_start + bs * index * (index + 1)).float()
    else:
        bs = (h.position_range[3] - h.depth_start) / h.depth_num
        coords_d = (h.depth_start + bs * index).float()

    d = h.depth_num
    k = centers_px.shape[1]
    xy = centers_px.expand(b, k, d, 2)
    dd = coords_d.view(1, 1, d, 1).expand(b, k, d, 1)
    coords = torch.cat([xy * dd.clamp(min=eps), dd, torch.ones_like(dd)],
                       dim=-1)
    i2l = data["img2lidar"][:, :, None].expand(b, n, hw_n, 4, 4)
    i2l = i2l.reshape(b, n * hw_n, 4, 4)
    c3d = torch.einsum("bkij,bkdj->bkdi", i2l, coords)[..., :3]
    pr = torch.tensor(h.position_range, dtype=torch.float32)
    c3d = (c3d - pr[:3]) / (pr[3:6] - pr[:3])
    c3d = c3d.reshape(b, k, d * 3)
    pe = mlp_relu2(sd, "pts_bbox_head.position_encoder.0",
                   "pts_bbox_head.position_encoder.2", inverse_sigmoid(c3d))
    cone = torch.cat([intr, c3d[..., -3:], c3d[..., -90:-87]], dim=-1)
    return pe, cone


def mha(sd, pre, q, k, v, heads, return_weights=False):
    """torch nn.MultiheadAttention math from the packed in_proj."""
    b, nq, c = q.shape
    w = T(sd[pre + ".in_proj_weight"])
    bi = T(sd[pre + ".in_proj_bias"])
    qh = F.linear(q, w[:c], bi[:c])
    kh = F.linear(k, w[c:2 * c], bi[c:2 * c])
    vh = F.linear(v, w[2 * c:], bi[2 * c:])
    d = c // heads
    qh = qh.view(b, -1, heads, d).permute(0, 2, 1, 3)
    kh = kh.view(b, -1, heads, d).permute(0, 2, 1, 3)
    vh = vh.view(b, -1, heads, d).permute(0, 2, 1, 3)
    logits = (qh * d ** -0.5) @ kh.transpose(-2, -1)
    wgt = logits.softmax(dim=-1)
    out = (wgt @ vh).permute(0, 2, 1, 3).reshape(b, -1, c)
    out = lin(sd, pre + ".out_proj", out)
    if return_weights:
        return out, wgt.mean(dim=1)
    return out


def decoder_layer(sd, pre, query, memory, query_pos, pos_embed, temp_memory,
                  temp_pos, heads):
    """PETRTemporalDecoderLayer (petr_transformer.py:653-760)."""
    if temp_memory is not None:
        tk = torch.cat([query, temp_memory], dim=1)
        tp = torch.cat([query_pos, temp_pos], dim=1)
    else:
        tk, tp = query, query_pos
    out = mha(sd, pre + "attentions.0.attn", query + query_pos, tk + tp, tk,
              heads)
    query = ln(sd, pre + "norms.0", query + out, eps=1e-5)
    out = mha(sd, pre + "attentions.1.attn", query + query_pos,
              memory + pos_embed, memory, heads)
    query = ln(sd, pre + "norms.1", query + out, eps=1e-5)
    h = F.relu(lin(sd, pre + "ffns.0.layers.0.0", query))
    query = ln(sd, pre + "norms.2",
               query + lin(sd, pre + "ffns.0.layers.1", h), eps=1e-5)
    return query


def cls_branch(sd, x):
    x = F.relu(ln(sd, "pts_bbox_head.cls_branches.0.1",
                  lin(sd, "pts_bbox_head.cls_branches.0.0", x), eps=1e-5))
    x = F.relu(ln(sd, "pts_bbox_head.cls_branches.0.4",
                  lin(sd, "pts_bbox_head.cls_branches.0.3", x), eps=1e-5))
    return lin(sd, "pts_bbox_head.cls_branches.0.6", x)


def reg_branch(sd, x):
    x = F.relu(lin(sd, "pts_bbox_head.reg_branches.0.0", x))
    x = F.relu(lin(sd, "pts_bbox_head.reg_branches.0.2", x))
    return lin(sd, "pts_bbox_head.reg_branches.0.4", x)


def head_forward(sd, cfg, feats, data, mem):
    """StreamPETRHead.forward eval (streampetr_head.py:604-680)."""
    h = cfg.head
    e = h.embed_dims
    mem = pre_update(sd, cfg, mem, data["timestamp"], data["ego_pose_inv"],
                     data["prev_exists"])

    b, n, fh, fw, c = feats.shape
    memory = feats.reshape(b, n * fh * fw, c)
    pos_embed, cone = position_embedding(sd, cfg, data, (fh, fw))
    memory = mlp_relu2(sd, "pts_bbox_head.memory_embed.0",
                       "pts_bbox_head.memory_embed.2", memory)
    memory = mln(sd, "pts_bbox_head.spatial_alignment", memory, cone)
    pos_embed = se(sd, "pts_bbox_head.featurized_pe", pos_embed, memory)

    reference_points = T(sd["pts_bbox_head.reference_points.weight"])
    reference_points = reference_points[None].expand(b, -1, -1)
    query_pos = mlp_relu2(sd, "pts_bbox_head.query_embedding.0",
                          "pts_bbox_head.query_embedding.2",
                          pos2posemb3d(reference_points,
                                       num_pos_feats=e // 2))
    tgt = torch.zeros_like(query_pos)

    # temporal alignment (streampetr_head.py:424-453)
    pc = torch.tensor(h.pc_range, dtype=torch.float32)
    temp_ref_norm = (mem["reference_point"] - pc[:3]) / (pc[3:6] - pc[:3])
    temp_pos = mlp_relu2(sd, "pts_bbox_head.query_embedding.0",
                         "pts_bbox_head.query_embedding.2",
                         pos2posemb3d(temp_ref_norm, num_pos_feats=e // 2))
    temp_memory = mem["embedding"]
    if h.with_ego_pos:
        eye_flat = torch.eye(4)[:3, :].reshape(1, 1, 12).expand(
            b, query_pos.shape[1], 12)
        rec_motion = torch.cat(
            [torch.zeros_like(reference_points[..., :3]), eye_flat], dim=-1)
        rec_motion = nerf_enc(rec_motion)
        tgt = mln(sd, "pts_bbox_head.ego_pose_memory", tgt, rec_motion)
        query_pos = mln(sd, "pts_bbox_head.ego_pose_pe", query_pos,
                        rec_motion)
        mem_motion = torch.cat(
            [mem["velo"], mem["timestamp"],
             mem["egopose"][..., :3, :].reshape(b, -1, 12)], dim=-1)
        mem_motion = nerf_enc(mem_motion)
        temp_pos = mln(sd, "pts_bbox_head.ego_pose_pe", temp_pos, mem_motion)
        temp_memory = mln(sd, "pts_bbox_head.ego_pose_memory", temp_memory,
                          mem_motion)
    query_pos = query_pos + ln(
        sd, "pts_bbox_head.time_embedding.1",
        lin(sd, "pts_bbox_head.time_embedding.0",
            pos2posemb1d(torch.zeros_like(reference_points[..., :1]),
                         num_pos_feats=e)), eps=1e-5)
    temp_pos = temp_pos + ln(
        sd, "pts_bbox_head.time_embedding.1",
        lin(sd, "pts_bbox_head.time_embedding.0",
            pos2posemb1d(mem["timestamp"], num_pos_feats=e)), eps=1e-5)
    if h.num_propagated > 0:
        p = h.num_propagated
        tgt = torch.cat([tgt, temp_memory[:, :p]], dim=1)
        query_pos = torch.cat([query_pos, temp_pos[:, :p]], dim=1)
        reference_points = torch.cat(
            [reference_points, temp_ref_norm[:, :p]], dim=1)
        temp_memory = temp_memory[:, p:]
        temp_pos = temp_pos[:, p:]
    rec_ego_pose = torch.eye(4).view(1, 1, 4, 4).expand(
        b, query_pos.shape[1], 4, 4)

    outs = []
    query = tgt
    for i in range(h.decoder.num_layers):
        pre = f"pts_bbox_head.transformer.decoder.layers.{i}."
        query = decoder_layer(sd, pre, query, memory, query_pos, pos_embed,
                              temp_memory, temp_pos, h.decoder.num_heads)
        outs.append(ln(sd, "pts_bbox_head.transformer.decoder.post_norm",
                       query, eps=1e-5))
    outs_dec = torch.stack(outs)

    ref_inv = inverse_sigmoid(reference_points.clamp(0, 1))
    all_cls, all_box = [], []
    for lvl in range(outs_dec.shape[0]):
        cls = cls_branch(sd, outs_dec[lvl])
        tmp = reg_branch(sd, outs_dec[lvl])
        xyz = torch.sigmoid(tmp[..., :3] + ref_inv)
        all_cls.append(cls)
        all_box.append(torch.cat([xyz, tmp[..., 3:]], dim=-1))
    all_cls = torch.stack(all_cls)
    all_box = torch.stack(all_box)
    xyz = all_box[..., :3] * (pc[3:6] - pc[:3]) + pc[:3]
    all_box = torch.cat([xyz, all_box[..., 3:]], dim=-1)

    # post update (streampetr_head.py:348-377)
    cls_last, box_last, out_last = all_cls[-1], all_box[-1], outs_dec[-1]
    rec_score = cls_last.sigmoid().max(dim=-1, keepdim=True).values
    _, topk = rec_score[..., 0].topk(h.topk_proposals, dim=1)
    gat = lambda t: torch.gather(
        t, 1, topk.reshape(b, -1, *([1] * (t.dim() - 2))).expand(
            -1, -1, *t.shape[2:]))
    rec_ref = gat(box_last[..., :3])
    rec_velo = gat(box_last[..., -2:])
    rec_mem = gat(out_last)
    rec_ego = gat(rec_ego_pose)
    rec_ts = torch.zeros_like(rec_score.gather(
        1, topk[..., None]))

    L = h.memory_len
    emb = torch.cat([rec_mem, mem["embedding"]], dim=1)[:, :L]
    ts = torch.cat([rec_ts, mem["timestamp"]], dim=1)[:, :L]
    ego = torch.cat([rec_ego, mem["egopose"]], dim=1)[:, :L]
    ref = torch.cat([rec_ref, mem["reference_point"]], dim=1)[:, :L]
    velo = torch.cat([rec_velo, mem["velo"]], dim=1)[:, :L]
    ref = transform_points(ref, data["ego_pose"])
    ts = ts - data["timestamp"].view(b, 1, 1)
    ego = torch.einsum("bij,bljk->blik", data["ego_pose"], ego)
    new_mem = {"embedding": emb, "reference_point": ref, "timestamp": ts,
               "egopose": ego, "velo": velo}
    return {"all_cls_scores": all_cls, "all_bbox_preds": all_box}, new_mem


def decode(cfg, all_cls, all_box):
    """NMSFreeCoder (nms_free_coder.py:39-111) + bottom-center z."""
    h = cfg.head
    cls = all_cls[-1].sigmoid()
    box = all_box[-1]
    b, q, c = cls.shape
    scores, idx = cls.reshape(b, q * c).topk(h.max_decode, dim=1)
    labels = idx % h.num_classes
    bidx = idx // h.num_classes
    box = torch.gather(box, 1, bidx[..., None].expand(-1, -1, box.shape[-1]))
    rot = torch.atan2(box[..., 6:7], box[..., 7:8])
    final = torch.cat([box[..., 0:3], box[..., 3:6].exp(), rot,
                       box[..., 8:10]], dim=-1)
    pcr = torch.tensor(h.post_center_range, dtype=torch.float32)
    valid = ((final[..., :3] >= pcr[:3]).all(dim=-1)
             & (final[..., :3] <= pcr[3:]).all(dim=-1))
    z = final[..., 2:3] - final[..., 5:6] * 0.5
    final = torch.cat([final[..., :2], z, final[..., 3:]], dim=-1)
    return final, scores, labels, valid


def torch_infer_step(sd, cfg, mem, frame, rope_tables):
    """Full Petr3D.simple_test restatement: one streaming frame."""
    img = T(frame["img"])
    b, n, H, W, _ = img.shape
    x = img.reshape(b * n, H, W, 3)
    data = {k: T(frame[k]) for k in ("intrinsics", "img2lidar", "timestamp",
                                     "ego_pose", "ego_pose_inv",
                                     "prev_exists")}
    nq = cfg.backbone.pruning_num_queries
    ctx = {
        "temp_queries": mem["embedding"][:, :nq],
        "temp_ref_points": mem["reference_point"][:, :nq],
        "temp_vel": mem["velo"][:, :nq],
        "temp_timestamp": mem["timestamp"][:, :nq],
        "temp_ego_pose": mem["egopose"][:, :nq],
        "ego_pose_inv": data["ego_pose_inv"],
    }
    with torch.no_grad():
        feats = backbone_forward(sd, cfg, x, ctx, data["prev_exists"],
                                 rope_tables)
        feats = neck_forward(sd, feats)
        fh, fw = feats.shape[1], feats.shape[2]
        feats = feats.reshape(b, n, fh, fw, -1)
        outs, mem = head_forward(sd, cfg, feats, data, mem)
        boxes, scores, labels, valid = decode(cfg, outs["all_cls_scores"],
                                              outs["all_bbox_preds"])
    return mem, (boxes, scores, labels, valid)
