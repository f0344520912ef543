"""Memory-bank update parity vs a torch restatement of the reference's
pre/post update math (streampetr_head.py:322-377) — the most intricate
state semantics in the model."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from toc3d_tpu.models.petr_transformer import DecoderConfig
from toc3d_tpu.models import streampetr_head as H


def cfg_small():
    return H.StreamPETRHeadConfig(
        embed_dims=16, in_channels=8, num_query=6, memory_len=10,
        topk_proposals=3, num_propagated=3, depth_num=32,
        decoder=DecoderConfig(embed_dims=16, num_heads=2, num_layers=1,
                              feedforward_channels=16))


def torch_pre_update(mem, timestamp, ego_pose_inv, prev_exists, pseudo_ref,
                     pc_range, num_prop, mem_len):
    """streampetr_head.py:322-346 restated."""
    emb, ref, ts, ego, velo = [torch.from_numpy(np.array(x)) for x in mem]
    x = torch.from_numpy(np.array(prev_exists)).view(-1, 1, 1)
    epi = torch.from_numpy(np.array(ego_pose_inv))

    ts = ts + torch.from_numpy(np.array(timestamp)).view(-1, 1, 1)
    ego = epi.unsqueeze(1) @ ego
    ref_h = torch.cat([ref, torch.ones_like(ref[..., :1])], -1)
    ref = (epi.unsqueeze(1) @ ref_h.unsqueeze(-1)).squeeze(-1)[..., :3]
    ts = ts[:, :mem_len] * x
    ref = ref[:, :mem_len] * x
    emb = emb[:, :mem_len] * x
    ego = ego[:, :mem_len] * x.unsqueeze(-1)
    velo = velo[:, :mem_len] * x

    pr = torch.from_numpy(np.array(pc_range))
    pseudo = (torch.from_numpy(np.array(pseudo_ref)) * (pr[3:6] - pr[0:3])
              + pr[0:3])
    ref[:, :num_prop] = ref[:, :num_prop] + (1 - x) * pseudo
    ego[:, :num_prop] = ego[:, :num_prop] + \
        (1 - x).unsqueeze(-1) * torch.eye(4, dtype=ego.dtype)
    return emb, ref, ts, ego, velo


def test_pre_update_memory_parity():
    cfg = cfg_small()
    params = H.init_streampetr_head(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    b, L = 2, cfg.memory_len
    bank = H.MemoryBank(
        embedding=jnp.asarray(rng.randn(b, L, 16).astype(np.float32)),
        reference_point=jnp.asarray(rng.randn(b, L, 3).astype(np.float32)),
        timestamp=jnp.asarray(rng.randn(b, L, 1).astype(np.float32)),
        egopose=jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (b, L, 1, 1))
            + rng.randn(b, L, 4, 4).astype(np.float32) * 0.01),
        velo=jnp.asarray(rng.randn(b, L, 2).astype(np.float32)))
    ts = np.array([0.5, 0.7], np.float32)
    epi = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    epi[:, :3, 3] = rng.randn(b, 3) * 0.2
    pe = np.array([1.0, 0.0], np.float32)   # lane 0 streams, lane 1 resets

    out = H.pre_update_memory(cfg, params, bank, jnp.asarray(ts),
                              jnp.asarray(epi), jnp.asarray(pe))
    ref = torch_pre_update(
        [np.asarray(x) for x in bank], ts, epi, pe,
        np.asarray(params["pseudo_reference_points"]), cfg.pc_range,
        cfg.num_propagated, cfg.memory_len)
    names = ["embedding", "reference_point", "timestamp", "egopose", "velo"]
    for ours, theirs, name in zip(
            [out.embedding, out.reference_point, out.timestamp, out.egopose,
             out.velo], ref, names):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=1e-5, err_msg=name)


def torch_post_update(mem, timestamp, ego_pose, cls_scores, bbox_preds,
                      outs_dec, rec_ego_pose, topk, mem_len):
    """streampetr_head.py:348-377 restated (eval path, slice-at-end
    equivalence)."""
    emb, ref0, ts0, ego0, velo0 = [torch.from_numpy(np.array(x))
                                   for x in mem]
    cls_t = torch.from_numpy(np.array(cls_scores))[-1]
    box_t = torch.from_numpy(np.array(bbox_preds))[-1]
    dec_t = torch.from_numpy(np.array(outs_dec))[-1]
    rep = torch.from_numpy(np.array(rec_ego_pose))

    rec_ref = box_t[..., :3]
    rec_velo = box_t[..., -2:]
    rec_score = cls_t.sigmoid().topk(1, dim=-1).values[..., 0:1]
    rec_ts = torch.zeros_like(rec_score)
    _, idx = torch.topk(rec_score, topk, dim=1)

    def gather(f):
        i = idx.reshape(idx.shape[0], topk, *([1] * (f.dim() - 2)))
        i = i.expand(-1, -1, *f.shape[2:])
        return torch.gather(f, 1, i)

    rec_ts = gather(rec_ts)
    rec_ref = gather(rec_ref)
    rec_mem = gather(dec_t)
    rec_ego = gather(rep)
    rec_velo = gather(rec_velo)

    emb = torch.cat([rec_mem, emb], 1)[:, :mem_len]
    ts = torch.cat([rec_ts, ts0], 1)[:, :mem_len]
    ego = torch.cat([rec_ego, ego0], 1)[:, :mem_len]
    ref = torch.cat([rec_ref, ref0], 1)[:, :mem_len]
    velo = torch.cat([rec_velo, velo0], 1)[:, :mem_len]

    ep = torch.from_numpy(np.array(ego_pose))
    ref_h = torch.cat([ref, torch.ones_like(ref[..., :1])], -1)
    ref = (ep.unsqueeze(1) @ ref_h.unsqueeze(-1)).squeeze(-1)[..., :3]
    ts = ts - torch.from_numpy(np.array(timestamp)).view(-1, 1, 1)
    ego = ep.unsqueeze(1) @ ego
    return emb, ref, ts, ego, velo


def test_post_update_memory_parity():
    cfg = cfg_small()
    rng = np.random.RandomState(1)
    b, L = 2, cfg.memory_len
    q = cfg.num_query + cfg.num_propagated
    bank = H.MemoryBank(
        embedding=jnp.asarray(rng.randn(b, L, 16).astype(np.float32)),
        reference_point=jnp.asarray(rng.randn(b, L, 3).astype(np.float32)),
        timestamp=jnp.asarray(rng.randn(b, L, 1).astype(np.float32)),
        egopose=jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (b, L, 1, 1))),
        velo=jnp.asarray(rng.randn(b, L, 2).astype(np.float32)))
    cls = rng.randn(1, b, q, 10).astype(np.float32)
    box = rng.randn(1, b, q, 10).astype(np.float32)
    dec = rng.randn(1, b, q, 16).astype(np.float32)
    rep = np.tile(np.eye(4, dtype=np.float32), (b, q, 1, 1))
    ts = np.array([0.5, 0.7], np.float32)
    ep = np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))
    ep[:, :3, 3] = rng.randn(b, 3) * 0.3

    out = H.post_update_memory(cfg, bank, jnp.asarray(ts), jnp.asarray(ep),
                               jnp.asarray(cls), jnp.asarray(box),
                               jnp.asarray(dec), jnp.asarray(rep), 0)
    ref = torch_post_update([np.asarray(x) for x in bank], ts, ep, cls, box,
                            dec, rep, cfg.topk_proposals, cfg.memory_len)
    names = ["embedding", "reference_point", "timestamp", "egopose", "velo"]
    for ours, theirs, name in zip(
            [out.embedding, out.reference_point, out.timestamp, out.egopose,
             out.velo], ref, names):
        np.testing.assert_allclose(np.asarray(ours), theirs.numpy(),
                                   atol=1e-5, err_msg=name)
