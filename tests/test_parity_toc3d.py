"""Token-compression block parity: toc3d_block_forward (select -> merge ->
slow attn with rope-by-index -> broadcast update -> scatter) vs a torch
restatement of ToC3DEVAViTBlock's accelerate path (toc3d_eva_vit.py:395-473).
"""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from toc3d_tpu.models.toc3d_vit import ToC3DViTConfig, toc3d_block_forward
from toc3d_tpu.models.eva_vit import init_block
from toc3d_tpu.ops.rope import build_rope_table


def torch_rotate_half(x):
    y = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    a, b = y.unbind(-1)
    return torch.stack((-b, a), -1).reshape(x.shape)


def torch_block_accelerated(params, x, scores, window_size, ratio, cos, sin,
                            num_heads):
    """Restates ToC3DEVAViTBlock.forward accelerate path for (B,H,W,C) with
    H,W multiples of window_size (no pad) in torch, reading our param
    pytree."""
    def lin(p, t, bias=True):
        w = torch.from_numpy(np.asarray(p["w"]))
        b = torch.from_numpy(np.asarray(p["b"])) if bias and "b" in p else None
        return F.linear(t, w.T, b)

    def ln(p, t, eps=1e-6):
        return F.layer_norm(t, (t.shape[-1],),
                            torch.from_numpy(np.asarray(p["scale"])),
                            torch.from_numpy(np.asarray(p["bias"])), eps)

    B, H, W, C = x.shape
    ws = window_size
    xw = x.view(B, H // ws, ws, W // ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, C)
    sw = scores.view(B, H // ws, ws, W // ws, ws).permute(
        0, 1, 3, 2, 4).reshape(-1, ws * ws)

    n = ws * ws
    k = int(n * ratio)
    sorted_score, sorted_idx = torch.sort(sw, dim=1, descending=True)
    slow_idx, fast_idx = sorted_idx[:, :k], sorted_idx[:, k:]
    fast_score = sorted_score[:, k:]

    def gather(t, idx):
        return torch.gather(t, 1, idx.unsqueeze(-1).expand(-1, -1,
                                                           t.shape[-1]))

    slow = gather(xw, slow_idx)
    fast = gather(xw, fast_idx)
    wgt = fast_score / fast_score.sum(1, keepdim=True)
    rep = (wgt.unsqueeze(-1) * fast).sum(1, keepdim=True)
    slow = torch.cat([slow, rep], 1)
    sel_idx = torch.cat([slow_idx,
                         torch.full_like(slow_idx[:, :1], k)], -1)

    # slow path
    shortcut = slow
    hdn = ln(params["norm1"], slow)
    q = lin(params["attn"]["q_proj"], hdn)
    kk = lin(params["attn"]["k_proj"], hdn, bias=False)
    v = lin(params["attn"]["v_proj"], hdn)
    nb, nq, _ = q.shape
    d = C // num_heads
    q = q.view(nb, nq, num_heads, d).permute(0, 2, 1, 3)
    kk = kk.view(nb, nq, num_heads, d).permute(0, 2, 1, 3)
    v = v.view(nb, nq, num_heads, d).permute(0, 2, 1, 3)
    cos_g = torch.from_numpy(np.asarray(cos))[sel_idx].unsqueeze(1)
    sin_g = torch.from_numpy(np.asarray(sin))[sel_idx].unsqueeze(1)
    q = q * cos_g + torch_rotate_half(q) * sin_g
    kk = kk * cos_g + torch_rotate_half(kk) * sin_g
    attn = (q * d ** -0.5) @ kk.transpose(-2, -1)
    attn = attn.softmax(-1)
    out = (attn @ v).permute(0, 2, 1, 3).reshape(nb, nq, C)
    raw1 = lin(params["attn"]["proj"], out)
    slow = shortcut + raw1
    h2 = ln(params["norm2"], slow)
    hidden = F.silu(lin(params["mlp"]["w1"], h2)) * lin(params["mlp"]["w2"],
                                                        h2)
    hidden = ln(params["mlp"]["ffn_ln"], hidden)
    raw2 = lin(params["mlp"]["w3"], hidden)
    slow = slow + raw2

    slow, rep1, rep2 = slow[:, :-1], raw1[:, -1:], raw2[:, -1:]
    fast = fast + rep1 + rep2

    out = torch.zeros_like(xw)
    out.scatter_(1, slow_idx.unsqueeze(-1).expand(-1, -1, C), slow)
    out.scatter_(1, fast_idx.unsqueeze(-1).expand(-1, -1, C), fast)
    out = out.view(B, H // ws, W // ws, ws, ws, C).permute(
        0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
    return out


def test_toc3d_block_parity():
    cfg = ToC3DViTConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
        window_size=4, global_window_size=4, global_attn_indexes=(1, 3),
        pretrain_img_size=32, pruning_loc=(2,), token_ratio=(0.5,),
        pruning_num_queries=4, query_dim=32)
    params = jax.jit(lambda k: init_block(k, cfg))(jax.random.PRNGKey(3))
    cos, sin = build_rope_table(cfg.head_dim // 2, cfg.pt_hw_seq_len,
                                cfg.window_size)

    rng = np.random.RandomState(5)
    x = rng.randn(2, 8, 12, 32).astype(np.float32)
    # distinct scores so sort order is tie-free across frameworks
    scores = rng.permutation(2 * 8 * 12).reshape(2, 96).astype(np.float32)

    ours = toc3d_block_forward(params, jnp.asarray(x), jnp.asarray(scores),
                               cfg, cfg.window_size, 0.5, (cos, sin))
    ref = torch_block_accelerated(
        jax.device_get(params), torch.from_numpy(x),
        torch.from_numpy(scores.reshape(2, 8, 12)), cfg.window_size, 0.5,
        cos, sin, cfg.num_heads)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-5)
