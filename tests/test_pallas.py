"""Pallas fused window-attention kernel — interpret-mode correctness on the
CPU mesh (the real-TPU path is exercised by bench/eval runs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.ops.attention import eva_attention, init_eva_attention
from toc3d_tpu.ops.pallas.window_attn import (fused_window_attention_nc,
                                              tile_rope_tables)
from toc3d_tpu.ops.rope import build_rope_table


def test_fused_attention_matches_xla_interpret():
    rng = np.random.RandomState(0)
    b, n, c, h = 4, 64, 32, 2
    q = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    k = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    v = jnp.asarray(rng.randn(b, n, c).astype(np.float32))
    out = fused_window_attention_nc(q, k, v, None, None, h, interpret=True)
    # XLA reference
    d = c // h
    qh = q.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    kh = k.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    vh = v.reshape(b, n, h, d).transpose(0, 2, 1, 3)
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh * d ** -0.5, kh)
    ref = jnp.einsum("bhqk,bhkd->bhqd", jax.nn.softmax(logits, -1), vh)
    ref = ref.transpose(0, 2, 1, 3).reshape(b, n, c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_fused_attention_rope_and_mask_interpret():
    """Fused path (rope in-kernel, masked pad columns) == XLA select path."""
    rng = np.random.RandomState(1)
    b, n_valid, c, h = 3, 13, 32, 2
    n = 16  # padded
    cos, sin = build_rope_table(c // h // 2, 8, 8)  # 64-entry table
    p = {"q_proj": {"w": jnp.eye(c)}, "k_proj": {"w": jnp.eye(c)},
         "v_proj": {"w": jnp.eye(c)}, "proj": {"w": jnp.eye(c)}}
    x = jnp.asarray(rng.randn(b, n_valid, c).astype(np.float32))
    idx = jnp.asarray(rng.randint(0, 64, (b, n_valid)))

    ref = eva_attention(p, x, h, (cos, sin), select_idx=idx)

    xp = jnp.pad(x, ((0, 0), (0, n - n_valid), (0, 0)))
    tc, ts = tile_rope_tables(cos, sin, h, n, select_idx=idx)
    tc = jnp.pad(tc, ((0, 0), (0, n - n_valid), (0, 0)))
    ts = jnp.pad(ts, ((0, 0), (0, n - n_valid), (0, 0)))
    out = fused_window_attention_nc(xp, xp, xp, tc, ts, h, n_valid=n_valid,
                                    interpret=True)[:, :n_valid]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
