"""Decomposed rel-pos, ResBottleneckBlock, layer-decay multipliers."""
import numpy as np
import jax
import jax.numpy as jnp
import torch

from toc3d_tpu.ops.rel_pos import get_rel_pos, add_decomposed_rel_pos
from toc3d_tpu.models.eva_vit import (init_res_bottleneck, res_bottleneck,
                                      get_vit_lr_decay_rate)


def test_get_rel_pos_same_size():
    rng = np.random.RandomState(0)
    table = rng.randn(2 * 8 - 1, 4).astype(np.float32)
    out = np.asarray(get_rel_pos(8, 8, table))
    assert out.shape == (8, 8, 4)
    # diagonal = zero relative offset row (index k_size-1)
    np.testing.assert_allclose(out[3, 3], table[7])
    np.testing.assert_allclose(out[0, 7], table[0])
    np.testing.assert_allclose(out[7, 0], table[14])


def test_add_decomposed_rel_pos_matches_torch():
    rng = np.random.RandomState(1)
    b, qh, qw, c = 2, 4, 5, 8
    attn = rng.randn(b, qh * qw, qh * qw).astype(np.float32)
    q = rng.randn(b, qh * qw, c).astype(np.float32)
    rh = rng.randn(2 * qh - 1, c).astype(np.float32)
    rw = rng.randn(2 * qw - 1, c).astype(np.float32)
    ours = np.asarray(add_decomposed_rel_pos(
        jnp.asarray(attn), jnp.asarray(q), rh, rw, (qh, qw), (qh, qw)))

    # torch restatement (eva_utils.py:197-226)
    Rh = np.asarray(get_rel_pos(qh, qh, rh))
    Rw = np.asarray(get_rel_pos(qw, qw, rw))
    r_q = torch.from_numpy(q).reshape(b, qh, qw, c)
    rel_h = torch.einsum("bhwc,hkc->bhwk", r_q, torch.from_numpy(Rh))
    rel_w = torch.einsum("bhwc,wkc->bhwk", r_q, torch.from_numpy(Rw))
    ref = (torch.from_numpy(attn).view(b, qh, qw, qh, qw)
           + rel_h[:, :, :, :, None] + rel_w[:, :, :, None, :]
           ).reshape(b, qh * qw, qh * qw)
    np.testing.assert_allclose(ours, ref.numpy(), atol=1e-5)


def test_res_bottleneck_identity_at_init():
    # norm3 zero-init -> block is identity at init (eva_vit.py:170-172)
    p = init_res_bottleneck(jax.random.PRNGKey(0), 16)
    x = jnp.asarray(np.random.RandomState(2).randn(1, 4, 4, 16)
                    .astype(np.float32))
    out = res_bottleneck(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x), atol=1e-6)


def test_layer_decay_rates():
    assert get_vit_lr_decay_rate("img_backbone/pos_embed", 0.9, 24) == \
        0.9 ** 25
    assert get_vit_lr_decay_rate(
        "img_backbone/blocks/23/attn/q_proj/w", 0.9, 24) == \
        0.9 ** (25 - 24)
    assert get_vit_lr_decay_rate("pts_bbox_head/cls_branch/fc0/w",
                                 0.9, 24) == 1.0
