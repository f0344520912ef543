"""Head-piece parity vs independent torch restatements of the reference
math (petr_transformer.py decoder layer; streampetr_head position
embedding), wired through the checkpoint converter."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn as nn

from toc3d_tpu.models.petr_transformer import (DecoderConfig,
                                               decoder_layer_forward)
from toc3d_tpu.models import streampetr_head as H
from toc3d_tpu.runtime.checkpoint import _SD, convert_decoder_layer, _to_jnp


class TorchDecoderLayer(nn.Module):
    """Restates PETRTemporalDecoderLayer (petr_transformer.py:653-760):
    post-norm self_attn(query ⊕ temp_memory) -> cross_attn -> FFN."""

    def __init__(self, c=32, heads=2, ffn=64):
        super().__init__()
        self.attentions = nn.ModuleList()
        for _ in range(2):
            m = nn.Module()
            m.attn = nn.MultiheadAttention(c, heads, batch_first=True)
            self.attentions.append(m)
        ffn_mod = nn.Module()
        ffn_mod.layers = nn.Sequential(
            nn.Sequential(nn.Linear(c, ffn), nn.ReLU(), nn.Dropout(0.0)),
            nn.Linear(ffn, c), nn.Dropout(0.0))
        self.ffns = nn.ModuleList([ffn_mod])
        self.norms = nn.ModuleList([nn.LayerNorm(c) for _ in range(3)])

    def forward(self, query, key, value, query_pos, key_pos, temp_memory,
                temp_pos, attn_mask):
        tk = torch.cat([query, temp_memory], dim=1)
        tp = torch.cat([query_pos, temp_pos], dim=1)
        out, _ = self.attentions[0].attn(query + query_pos, tk + tp, tk,
                                         attn_mask=attn_mask)
        query = self.norms[0](query + out)
        out, _ = self.attentions[1].attn(query + query_pos, key + key_pos,
                                         value)
        query = self.norms[1](query + out)
        h = self.ffns[0].layers[0](query)
        h = self.ffns[0].layers[1](h)
        query = self.norms[2](query + h)
        return query


def test_decoder_layer_parity():
    torch.manual_seed(0)
    c, heads = 32, 2
    tl = TorchDecoderLayer(c, heads).eval()
    b, q, k, m = 2, 5, 11, 4
    query = torch.randn(b, q, c)
    key = torch.randn(b, k, c)
    qp = torch.randn(b, q, c)
    kp = torch.randn(b, k, c)
    tm = torch.randn(b, m, c)
    tp2 = torch.randn(b, m, c)
    mask = torch.zeros(q, q + m, dtype=torch.bool)
    mask[0, 1] = True
    with torch.no_grad():
        ref = tl(query, key, key, qp, kp, tm, tp2, mask)

    sd = {kk: vv.detach().numpy() for kk, vv in tl.state_dict().items()}
    params = _to_jnp(convert_decoder_layer(_SD(sd)))
    cfg = DecoderConfig(embed_dims=c, num_heads=heads, num_layers=1,
                        feedforward_channels=64, dropout=0.0)
    ours, _ = decoder_layer_forward(
        params, cfg, jnp.asarray(query.numpy()), jnp.asarray(key.numpy()),
        jnp.asarray(key.numpy()), jnp.asarray(qp.numpy()),
        jnp.asarray(kp.numpy()), jnp.asarray(tm.numpy()),
        jnp.asarray(tp2.numpy()), jnp.asarray(mask.numpy()))
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), atol=3e-5)


def torch_position_embedding(cfg, intrinsics, img2lidar, centers_px,
                             pe_w0, pe_b0, pe_w1, pe_b1):
    """Restates streampetr_head.py:379-422 in torch."""
    import torch.nn.functional as F
    B, N = intrinsics.shape[:2]
    HW = centers_px.shape[0]
    LEN = N * HW
    D = cfg.depth_num
    eps = 1e-5

    intrinsic = torch.stack([intrinsics[..., 0, 0], intrinsics[..., 1, 1]],
                            -1).abs() / 1e3
    intrinsic = intrinsic.repeat(1, HW, 1).view(B, -1, 2)

    centers = centers_px.view(1, 1, HW, 2).expand(B, N, HW, 2)
    centers = centers.reshape(B, LEN, 1, 2).repeat(1, 1, D, 1)

    index = torch.arange(D).float()
    bin_size = (cfg.position_range[3] - cfg.depth_start) / (D * (1 + D))
    coords_d = cfg.depth_start + bin_size * index * (index + 1)
    cd = coords_d.view(1, 1, D, 1).repeat(B, LEN, 1, 1)
    coords = torch.cat([centers, cd], -1)
    coords = torch.cat([coords, torch.ones_like(coords[..., :1])], -1)
    coords[..., :2] = coords[..., :2] * torch.maximum(
        coords[..., 2:3], torch.ones_like(coords[..., 2:3]) * eps)
    i2l = img2lidar.view(B * N, 1, 1, 4, 4).repeat(1, HW, D, 1, 1).view(
        B, LEN, D, 4, 4)
    c3d = torch.matmul(i2l, coords.unsqueeze(-1)).squeeze(-1)[..., :3]
    pr = torch.tensor(cfg.position_range)
    c3d = (c3d - pr[0:3]) / (pr[3:6] - pr[0:3])
    c3d = c3d.reshape(B, LEN, D * 3)
    x = c3d.clamp(0, 1)
    pe = torch.log(x.clamp(min=1e-5) / (1 - x).clamp(min=1e-5))
    pe = F.linear(pe, pe_w0, pe_b0).relu()
    pe = F.linear(pe, pe_w1, pe_b1)
    cone = torch.cat([intrinsic, c3d[..., -3:], c3d[..., -90:-87]], -1)
    return pe, cone


def test_position_embedding_parity():
    from toc3d_tpu.models.petr_transformer import DecoderConfig
    cfg = H.StreamPETRHeadConfig(
        embed_dims=32, in_channels=16, num_query=8, depth_num=64, LID=True,
        decoder=DecoderConfig(embed_dims=32, num_heads=2, num_layers=1,
                              feedforward_channels=32))
    key = jax.random.PRNGKey(0)
    params = H.init_streampetr_head(key, cfg)

    rng = np.random.RandomState(0)
    b, n, fh, fw = 1, 2, 4, 8
    intr = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr[..., 0, 0] = 800.0
    intr[..., 1, 1] = 700.0
    i2l = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    i2l[..., :3, 3] = rng.randn(b, n, 3) * 0.1

    centers = H.location_grid(fh, fw, 16, 64, 128)
    data = {"intrinsics": jnp.asarray(intr), "img2lidar": jnp.asarray(i2l),
            "pad_shape": (64, 128)}
    ours_pe, ours_cone = H.position_embeding(params, cfg, data, centers, None)

    centers_px = np.asarray(centers).reshape(-1, 2) * np.asarray([128, 64])
    w0 = np.asarray(params["position_encoder"]["fc0"]["w"]).T
    b0 = np.asarray(params["position_encoder"]["fc0"]["b"])
    w1 = np.asarray(params["position_encoder"]["fc1"]["w"]).T
    b1 = np.asarray(params["position_encoder"]["fc1"]["b"])
    ref_pe, ref_cone = torch_position_embedding(
        cfg, torch.from_numpy(intr), torch.from_numpy(i2l),
        torch.from_numpy(centers_px.astype(np.float32)),
        torch.from_numpy(w0), torch.from_numpy(b0), torch.from_numpy(w1),
        torch.from_numpy(b1))
    np.testing.assert_allclose(np.asarray(ours_cone), ref_cone.numpy(),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(ours_pe), ref_pe.numpy(),
                               atol=2e-3)
