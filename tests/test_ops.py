"""Unit tests for primitive ops, cross-checked against torch-cpu oracles that
restate the reference math independently."""
import math

import numpy as np
import pytest
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from toc3d_tpu.ops import gather, posenc, resize, rope, window
from toc3d_tpu import layers


def t2n(x):
    return x.detach().cpu().numpy()


# ---------------------------------------------------------------------------
# positional encodings
# ---------------------------------------------------------------------------

def torch_pos2posemb3d(pos, num_pos_feats=128, temperature=10000):
    scale = 2 * math.pi
    pos = pos * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = pos[..., 0, None] / dim_t
    pos_y = pos[..., 1, None] / dim_t
    pos_z = pos[..., 2, None] / dim_t
    pos_x = torch.stack((pos_x[..., 0::2].sin(), pos_x[..., 1::2].cos()), dim=-1).flatten(-2)
    pos_y = torch.stack((pos_y[..., 0::2].sin(), pos_y[..., 1::2].cos()), dim=-1).flatten(-2)
    pos_z = torch.stack((pos_z[..., 0::2].sin(), pos_z[..., 1::2].cos()), dim=-1).flatten(-2)
    return torch.cat((pos_y, pos_x, pos_z), dim=-1)


def test_pos2posemb3d_matches_torch():
    rng = np.random.RandomState(0)
    pos = rng.rand(4, 7, 3).astype(np.float32)
    ours = np.asarray(posenc.pos2posemb3d(jnp.asarray(pos)))
    ref = t2n(torch_pos2posemb3d(torch.from_numpy(pos)))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_pos2posemb1d_shape_and_values():
    pos = np.linspace(0, 1, 5, dtype=np.float32).reshape(5, 1)
    out = np.asarray(posenc.pos2posemb1d(jnp.asarray(pos)))
    assert out.shape == (5, 256)
    # position 0 -> sin terms 0, cos terms 1
    np.testing.assert_allclose(out[0, 0::2], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[0, 1::2], 1.0, atol=1e-6)


def test_nerf_positional_encoding():
    x = np.random.RandomState(1).randn(3, 15).astype(np.float32)
    out = np.asarray(posenc.nerf_positional_encoding(jnp.asarray(x)))
    assert out.shape == (3, 15 * 12)
    np.testing.assert_allclose(out[:, :15], np.sin(x), atol=1e-6)
    np.testing.assert_allclose(out[:, 15:30], np.cos(x), atol=1e-6)
    np.testing.assert_allclose(out[:, 30:45], np.sin(2 * x), atol=1e-6)


# ---------------------------------------------------------------------------
# RoPE
# ---------------------------------------------------------------------------

def torch_rope_table(dim, pt_seq_len, ft_seq_len, theta=10000):
    freqs = 1.0 / (theta ** (torch.arange(0, dim, 2)[: dim // 2].float() / dim))
    t = torch.arange(ft_seq_len).float() / ft_seq_len * pt_seq_len
    f = torch.einsum("i,f->if", t, freqs)
    f = f.repeat_interleave(2, dim=-1)
    grid = torch.cat(
        [f[:, None, :].expand(ft_seq_len, ft_seq_len, -1),
         f[None, :, :].expand(ft_seq_len, ft_seq_len, -1)], dim=-1)
    grid = grid.reshape(ft_seq_len * ft_seq_len, -1)
    return grid.cos(), grid.sin()


def torch_rotate_half(x):
    x = x.reshape(*x.shape[:-1], x.shape[-1] // 2, 2)
    x1, x2 = x.unbind(dim=-1)
    return torch.stack((-x2, x1), dim=-1).reshape(*x.shape[:-2], -1)


def test_rope_table_matches_torch():
    cos, sin = rope.build_rope_table(32, pt_seq_len=16, ft_seq_len=16)
    tcos, tsin = torch_rope_table(32, 16, 16)
    np.testing.assert_allclose(cos, t2n(tcos), atol=1e-6)
    np.testing.assert_allclose(sin, t2n(tsin), atol=1e-6)


def test_apply_rope_matches_torch():
    cos, sin = rope.build_rope_table(32, 16, 16)
    rng = np.random.RandomState(2)
    t = rng.randn(2, 4, 256, 64).astype(np.float32)
    ours = np.asarray(rope.apply_rope(jnp.asarray(t), cos, sin))
    tt = torch.from_numpy(t)
    ref = tt * torch.from_numpy(cos) + torch_rotate_half(tt) * torch.from_numpy(sin)
    np.testing.assert_allclose(ours, t2n(ref), atol=1e-5)


def test_apply_rope_select_gathers_rows():
    cos, sin = rope.build_rope_table(32, 16, 16)
    rng = np.random.RandomState(3)
    t = rng.randn(2, 4, 10, 64).astype(np.float32)
    idx = rng.randint(0, 256, size=(2, 10))
    ours = np.asarray(rope.apply_rope_select(jnp.asarray(t), cos, sin, jnp.asarray(idx)))
    for b in range(2):
        c = cos[idx[b]]
        s = sin[idx[b]]
        tt = torch.from_numpy(t[b])
        ref = tt * torch.from_numpy(c) + torch_rotate_half(tt) * torch.from_numpy(s)
        np.testing.assert_allclose(ours[b], t2n(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# window partition
# ---------------------------------------------------------------------------

def torch_window_partition(x, window_size, pad_value=0.0):
    B, H, W, C = x.shape
    pad_h = (window_size - H % window_size) % window_size
    pad_w = (window_size - W % window_size) % window_size
    if pad_h > 0 or pad_w > 0:
        x = F.pad(x, (0, 0, 0, pad_w, 0, pad_h), value=pad_value)
    Hp, Wp = H + pad_h, W + pad_w
    x = x.view(B, Hp // window_size, window_size, Wp // window_size, window_size, C)
    return x.permute(0, 1, 3, 2, 4, 5).reshape(-1, window_size, window_size, C), (Hp, Wp)


@pytest.mark.parametrize("hw,ws", [((20, 50), 16), ((20, 50), 20), ((32, 32), 16)])
def test_window_partition_roundtrip_and_parity(hw, ws):
    h, w = hw
    rng = np.random.RandomState(4)
    x = rng.randn(2, h, w, 8).astype(np.float32)
    ours, pad = window.window_partition(jnp.asarray(x), ws, pad_value=-1e6)
    ref, tpad = torch_window_partition(torch.from_numpy(x), ws, pad_value=-1e6)
    assert pad == tpad
    np.testing.assert_allclose(np.asarray(ours), t2n(ref), atol=0)
    back = window.window_unpartition(ours, ws, pad, (h, w))
    np.testing.assert_allclose(np.asarray(back), x, atol=0)


# ---------------------------------------------------------------------------
# gathers
# ---------------------------------------------------------------------------

def test_batch_index_select_fill_merge():
    rng = np.random.RandomState(5)
    x = rng.randn(3, 12, 4).astype(np.float32)
    perm = np.stack([rng.permutation(12) for _ in range(3)])
    idx1, idx2 = perm[:, :7], perm[:, 7:]
    x1 = np.asarray(gather.batch_index_select(jnp.asarray(x), jnp.asarray(idx1)))
    x2 = np.asarray(gather.batch_index_select(jnp.asarray(x), jnp.asarray(idx2)))
    for b in range(3):
        np.testing.assert_allclose(x1[b], x[b, idx1[b]])
    refill = np.asarray(gather.batch_index_fill(
        jnp.zeros_like(jnp.asarray(x)), jnp.asarray(x1), jnp.asarray(x2),
        jnp.asarray(idx1), jnp.asarray(idx2)))
    np.testing.assert_allclose(refill, x, atol=0)

    score = np.abs(rng.randn(3, 5)).astype(np.float32)
    xd = rng.randn(3, 5, 4).astype(np.float32)
    m = np.asarray(gather.merge_tokens(jnp.asarray(xd), jnp.asarray(score)))
    ref = (score / score.sum(1, keepdims=True))[..., None] * xd
    np.testing.assert_allclose(m, ref.sum(1, keepdims=True), atol=1e-6)


def test_topk_gather_and_memory_refresh():
    rng = np.random.RandomState(6)
    feat = rng.randn(2, 10, 3, 4).astype(np.float32)
    idx = rng.randint(0, 10, (2, 4, 1))
    out = np.asarray(gather.topk_gather(jnp.asarray(feat), jnp.asarray(idx)))
    for b in range(2):
        np.testing.assert_allclose(out[b], feat[b, idx[b, :, 0]])
    mem = rng.randn(2, 5, 3).astype(np.float32)
    pe = np.array([1.0, 0.0], np.float32)
    out = np.asarray(gather.memory_refresh(jnp.asarray(mem), jnp.asarray(pe)))
    np.testing.assert_allclose(out[0], mem[0])
    np.testing.assert_allclose(out[1], 0.0)


# ---------------------------------------------------------------------------
# bicubic resize parity with torch
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("inhw,outhw", [((14, 14), (20, 20)), ((14, 14), (20, 50)),
                                        ((14, 14), (50, 100))])
def test_bicubic_matches_torch(inhw, outhw):
    rng = np.random.RandomState(7)
    x = rng.randn(1, 8, *inhw).astype(np.float32)
    ours = np.asarray(resize.resize_bicubic_2d(jnp.asarray(x), *outhw))
    ref = t2n(F.interpolate(torch.from_numpy(x), size=outhw, mode="bicubic",
                            align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_bilinear_matches_torch():
    rng = np.random.RandomState(8)
    x = rng.randn(2, 4, 10, 25).astype(np.float32)
    ours = np.asarray(resize.resize_bilinear_2d(jnp.asarray(x), 20, 50))
    ref = t2n(F.interpolate(torch.from_numpy(x), size=(20, 50), mode="bilinear",
                            align_corners=False))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


# ---------------------------------------------------------------------------
# layers
# ---------------------------------------------------------------------------

def test_layer_norm_matches_torch():
    rng = np.random.RandomState(9)
    x = rng.randn(4, 17).astype(np.float32)
    p = {"scale": jnp.asarray(rng.randn(17).astype(np.float32)),
         "bias": jnp.asarray(rng.randn(17).astype(np.float32))}
    ours = np.asarray(layers.layer_norm(p, jnp.asarray(x), eps=1e-6))
    ref = t2n(F.layer_norm(torch.from_numpy(x), (17,),
                           torch.from_numpy(np.asarray(p["scale"])),
                           torch.from_numpy(np.asarray(p["bias"])), eps=1e-6))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_group_norm_matches_torch():
    rng = np.random.RandomState(10)
    x = rng.randn(2, 5, 7, 64).astype(np.float32)  # NHWC
    p = layers.init_group_norm(64)
    ours = np.asarray(layers.group_norm(p, jnp.asarray(x), num_groups=32))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = t2n(F.group_norm(xt, 32, torch.ones(64), torch.zeros(64), eps=1e-5))
    ref = np.transpose(ref, (0, 2, 3, 1))
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_swiglu_matches_torch_math():
    rng = np.random.RandomState(11)
    key = jax.random.PRNGKey(0)
    p = layers.init_swiglu(key, 16, 24)
    x = rng.randn(3, 16).astype(np.float32)
    ours = np.asarray(layers.swiglu(p, jnp.asarray(x)))

    xt = torch.from_numpy(x)
    w1 = torch.from_numpy(np.asarray(p["w1"]["w"]))
    b1 = torch.from_numpy(np.asarray(p["w1"]["b"]))
    w2 = torch.from_numpy(np.asarray(p["w2"]["w"]))
    b2 = torch.from_numpy(np.asarray(p["w2"]["b"]))
    w3 = torch.from_numpy(np.asarray(p["w3"]["w"]))
    b3 = torch.from_numpy(np.asarray(p["w3"]["b"]))
    hidden = F.silu(xt @ w1 + b1) * (xt @ w2 + b2)
    hidden = F.layer_norm(hidden, (24,), eps=1e-6)
    ref = t2n(hidden @ w3 + b3)
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_mln_identity_at_init():
    # gamma weight=0/bias=1, beta=0 -> MLN(x, c) == LN(x) at init
    key = jax.random.PRNGKey(1)
    p = layers.init_mln(key, 180, 16)
    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 5, 16).astype(np.float32))
    c = jnp.asarray(rng.randn(2, 5, 180).astype(np.float32))
    out = np.asarray(layers.mln(p, x, c))
    ref = np.asarray(layers.layer_norm({}, x, eps=1e-5))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_inverse_sigmoid_matches_torch():
    from toc3d_tpu.layers import inverse_sigmoid
    x = np.linspace(0, 1, 11).astype(np.float32)
    ours = np.asarray(inverse_sigmoid(jnp.asarray(x)))
    xt = torch.from_numpy(x).clamp(0, 1)
    x1 = xt.clamp(min=1e-5)
    x2 = (1 - xt).clamp(min=1e-5)
    ref = t2n(torch.log(x1 / x2))
    np.testing.assert_allclose(ours, ref, atol=2e-4)
