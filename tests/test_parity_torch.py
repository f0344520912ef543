"""End-to-end numerical parity: a torch mini-implementation of the
reference's EVA block / decoder math (independently restated, not imported)
is converted through runtime/checkpoint.py and must match our JAX forward.

This exercises at once: LN eps, RoPE tables + rotate_half, window
partition, SwiGLU with sub-LN, separate-qkv attention with q/v-only bias,
abs-pos bicubic resize, packed-MHA weight splitting, and the converter's
transposes.
"""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn
import torch.nn.functional as F

from toc3d_tpu.models.eva_vit import (EVAViTConfig, eva_vit_forward,
                                      make_rope_tables)
from toc3d_tpu.runtime.checkpoint import (_SD, convert_backbone,
                                          convert_decoder_layer, _to_jnp)
from toc3d_tpu.ops.attention import mha


# ---------------------------------------------------------------------------
# torch mini-EVA (restates eva_vit.py math for the test oracle)
# ---------------------------------------------------------------------------

def torch_rope_table(dim, pt_seq_len, ft_seq_len):
    freqs = 1.0 / (10000 ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    t = torch.arange(ft_seq_len).float() / ft_seq_len * pt_seq_len
    f = torch.einsum("i,f->if", t, freqs).repeat_interleave(2, dim=-1)
    grid = torch.cat([f[:, None, :].expand(ft_seq_len, ft_seq_len, -1),
                      f[None, :, :].expand(ft_seq_len, ft_seq_len, -1)], -1)
    grid = grid.reshape(ft_seq_len * ft_seq_len, -1)
    return grid.cos(), grid.sin()


def torch_rotate_half(x):
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


class TorchAttention(nn.Module):
    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.q_proj = nn.Linear(dim, dim, bias=False)
        self.k_proj = nn.Linear(dim, dim, bias=False)
        self.v_proj = nn.Linear(dim, dim, bias=False)
        self.q_bias = nn.Parameter(torch.zeros(dim))
        self.v_bias = nn.Parameter(torch.zeros(dim))
        self.proj = nn.Linear(dim, dim)
        self.rope = None

    def forward(self, x):
        B, H, W, C = x.shape
        x = x.reshape(B, -1, C)
        N = H * W
        q = F.linear(x, self.q_proj.weight, self.q_bias)
        k = F.linear(x, self.k_proj.weight, None)
        v = F.linear(x, self.v_proj.weight, self.v_bias)
        q = q.reshape(B, N, self.num_heads, -1).permute(0, 2, 1, 3)
        k = k.reshape(B, N, self.num_heads, -1).permute(0, 2, 1, 3)
        v = v.reshape(B, N, self.num_heads, -1).permute(0, 2, 1, 3)
        if self.rope is not None:
            cos, sin = self.rope
            q = (q * cos[:N] + torch_rotate_half(q) * sin[:N]).type_as(v)
            k = (k * cos[:N] + torch_rotate_half(k) * sin[:N]).type_as(v)
        scale = (C // self.num_heads) ** -0.5
        attn = (q * scale) @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        out = (attn @ v).transpose(1, 2).reshape(B, N, -1)
        return self.proj(out).reshape(B, H, W, C)


class TorchSwiGLU(nn.Module):
    def __init__(self, dim, hidden):
        super().__init__()
        self.w1 = nn.Linear(dim, hidden)
        self.w2 = nn.Linear(dim, hidden)
        self.ffn_ln = nn.LayerNorm(hidden, eps=1e-6)
        self.w3 = nn.Linear(hidden, dim)

    def forward(self, x):
        return self.w3(self.ffn_ln(F.silu(self.w1(x)) * self.w2(x)))


class TorchBlock(nn.Module):
    def __init__(self, dim, num_heads, hidden):
        super().__init__()
        self.norm1 = nn.LayerNorm(dim, eps=1e-6)
        self.attn = TorchAttention(dim, num_heads)
        self.norm2 = nn.LayerNorm(dim, eps=1e-6)
        self.mlp = TorchSwiGLU(dim, hidden)
        self.window_size = 0

    def forward(self, x):
        shortcut = x
        x = self.norm1(x)
        if self.window_size > 0:
            B, H, W, C = x.shape
            ws = self.window_size
            ph = (ws - H % ws) % ws
            pw = (ws - W % ws) % ws
            xp = F.pad(x, (0, 0, 0, pw, 0, ph))
            Hp, Wp = H + ph, W + pw
            xw = xp.view(B, Hp // ws, ws, Wp // ws, ws, C)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(-1, ws, ws, C)
            xw = self.attn(xw)
            xw = xw.view(B, Hp // ws, Wp // ws, ws, ws, C)
            xw = xw.permute(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
            x = xw[:, :H, :W]
        else:
            x = self.attn(x)
        x = shortcut + x
        return x + self.mlp(self.norm2(x))


class TorchEVA(nn.Module):
    def __init__(self, cfg: EVAViTConfig):
        super().__init__()
        self.cfg = cfg
        self.patch_embed = nn.Module()
        self.patch_embed.proj = nn.Conv2d(3, cfg.embed_dim, cfg.patch_size,
                                          cfg.patch_size)
        n = (cfg.pretrain_img_size // cfg.patch_size) ** 2 + 1
        self.pos_embed = nn.Parameter(torch.randn(1, n, cfg.embed_dim) * 0.02)
        hidden = int(cfg.embed_dim * cfg.mlp_ratio)
        self.blocks = nn.ModuleList([
            TorchBlock(cfg.embed_dim, cfg.num_heads, hidden)
            for _ in range(cfg.depth)])
        half = cfg.head_dim // 2
        self.rope_win = torch_rope_table(half, cfg.pt_hw_seq_len,
                                         cfg.window_size)
        self.rope_glb = torch_rope_table(half, cfg.pt_hw_seq_len,
                                         cfg.hw_seq_len)
        for i, blk in enumerate(self.blocks):
            is_glb = i in cfg.global_attn_indexes
            blk.window_size = (cfg.global_window_size if is_glb
                               else cfg.window_size)
            blk.attn.rope = self.rope_glb if is_glb else self.rope_win

    def forward(self, x):
        x = self.patch_embed.proj(x).permute(0, 2, 3, 1)
        h, w = x.shape[1], x.shape[2]
        pos = self.pos_embed[:, 1:]
        size = int(math.sqrt(pos.shape[1]))
        pos = F.interpolate(
            pos.reshape(1, size, size, -1).permute(0, 3, 1, 2), size=(h, w),
            mode="bicubic", align_corners=False).permute(0, 2, 3, 1)
        x = x + pos
        for blk in self.blocks:
            x = blk(x)
        return x


def test_eva_vit_parity_via_converter():
    torch.manual_seed(0)
    cfg = EVAViTConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=3, num_heads=2,
        window_size=4, global_window_size=4, global_attn_indexes=(1,),
        pretrain_img_size=48)
    tmodel = TorchEVA(cfg).eval()
    x = torch.randn(2, 3, 64, 96)

    with torch.no_grad():
        ref = tmodel(x).numpy()

    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    params = _to_jnp(convert_backbone(_SD(sd), cfg.depth))
    ours = eva_vit_forward(params, jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
                           cfg)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4)


# ---------------------------------------------------------------------------
# decoder MHA parity (packed in_proj split)
# ---------------------------------------------------------------------------

def test_mha_parity_with_torch():
    torch.manual_seed(1)
    c, h = 32, 4
    tmha = nn.MultiheadAttention(c, h, batch_first=True).eval()
    q = torch.randn(2, 5, c)
    kv = torch.randn(2, 9, c)
    mask = torch.zeros(5, 9, dtype=torch.bool)
    mask[:, -2:] = True
    with torch.no_grad():
        ref, ref_w = tmha(q, kv, kv, attn_mask=mask)

    sd = {f"attn.{k}": v.detach().numpy() for k, v in
          tmha.state_dict().items()}
    p = _SD(sd).mha("attn")
    p = _to_jnp(p)
    ours, ours_w = mha(p, jnp.asarray(q.numpy()), jnp.asarray(kv.numpy()),
                       jnp.asarray(kv.numpy()), h,
                       attn_mask=jnp.asarray(mask.numpy()),
                       return_weights=True)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(ours_w), ref_w.numpy(), atol=2e-5)


def test_decoder_layer_converter_shapes():
    """Converter handles a real torch decoder-layer state dict layout."""
    c = 32
    sd = {}
    for ai in (0, 1):
        sd[f"attentions.{ai}.attn.in_proj_weight"] = np.random.randn(
            3 * c, c).astype(np.float32)
        sd[f"attentions.{ai}.attn.in_proj_bias"] = np.random.randn(
            3 * c).astype(np.float32)
        sd[f"attentions.{ai}.attn.out_proj.weight"] = np.random.randn(
            c, c).astype(np.float32)
        sd[f"attentions.{ai}.attn.out_proj.bias"] = np.random.randn(
            c).astype(np.float32)
    sd["ffns.0.layers.0.0.weight"] = np.random.randn(64, c).astype(np.float32)
    sd["ffns.0.layers.0.0.bias"] = np.random.randn(64).astype(np.float32)
    sd["ffns.0.layers.1.weight"] = np.random.randn(c, 64).astype(np.float32)
    sd["ffns.0.layers.1.bias"] = np.random.randn(c).astype(np.float32)
    for i in range(3):
        sd[f"norms.{i}.weight"] = np.ones(c, np.float32)
        sd[f"norms.{i}.bias"] = np.zeros(c, np.float32)
    p = convert_decoder_layer(_SD(sd))
    assert p["self_attn"]["q_proj"]["w"].shape == (c, c)
    assert p["ffn"]["fc0"]["w"].shape == (c, 64)
    assert p["norm2"]["scale"].shape == (c,)
