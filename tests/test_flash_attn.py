"""Pallas flash decoder-attention kernel (ops/pallas/cross_attn.py) —
interpret-mode correctness + VJP exactness on the CPU mesh. The real-TPU
path is exercised by bench/profile runs (measured: 1.77 vs 4.33 ms/layer
at Q=900, K=30000, C=256, H=8 bf16 on v5e)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.ops.attention import init_mha, mha
from toc3d_tpu.ops.pallas import cross_attn
from toc3d_tpu.ops.pallas.cross_attn import (flash_attention,
                                             flash_attention_core, _xla_core)


@pytest.fixture(autouse=True)
def _force_fused_on_cpu():
    """mha(fused=True) skips the kernel on CPU by default; these tests exist
    to exercise it in interpret mode."""
    cross_attn.FORCE_FUSED_ON_CPU = True
    yield
    cross_attn.FORCE_FUSED_ON_CPU = False


@pytest.mark.parametrize("b,q,kv,c,h", [
    (1, 900, 3000, 256, 8),   # decoder cross-attn shape class (kv padded)
    (1, 900, 1668, 256, 8),   # decoder self-attn (query + temporal memory)
    (2, 37, 130, 64, 2),      # odd everything: q, kv, small dims
    (1, 8, 4096, 64, 2),      # kv exactly block-aligned (no mask branch)
])
def test_flash_core_matches_xla(b, q, kv, c, h):
    rng = np.random.RandomState(0)
    qa = jnp.asarray(rng.randn(b, q, c).astype(np.float32)) * 0.2
    ka = jnp.asarray(rng.randn(b, kv, c).astype(np.float32)) * 0.2
    va = jnp.asarray(rng.randn(b, kv, c).astype(np.float32))
    scale = (c // h) ** -0.5
    out = flash_attention_core(qa * scale, ka, va, h, interpret=True)
    ref = _xla_core(qa * scale, ka, va, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_vjp_matches_xla_grads():
    """Custom VJP: kernel primal, XLA cotangents — grads must equal the
    XLA core's exactly at the same inputs."""
    rng = np.random.RandomState(1)
    b, q, kv, c, h = 1, 24, 200, 64, 2
    qa = jnp.asarray(rng.randn(b, q, c).astype(np.float32)) * 0.3
    ka = jnp.asarray(rng.randn(b, kv, c).astype(np.float32)) * 0.3
    va = jnp.asarray(rng.randn(b, kv, c).astype(np.float32))
    cot = jnp.asarray(rng.randn(b, q, c).astype(np.float32))

    loss_f = lambda f: (lambda a, b_, c_: jnp.vdot(f(a, b_, c_, h), cot))
    g_fused = jax.grad(loss_f(flash_attention), argnums=(0, 1, 2))(qa, ka, va)
    g_xla = jax.grad(loss_f(_xla_core), argnums=(0, 1, 2))(qa, ka, va)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                                   atol=1e-6)


def test_mha_fused_flag_matches_unfused():
    """mha(fused=True) takes the kernel only in the eval configuration and
    reproduces the unfused output; mask/weights/dropout requests fall back."""
    rng = np.random.RandomState(2)
    b, q, kv, c, h = 2, 50, 300, 64, 2
    p = init_mha(jax.random.PRNGKey(0), c, h)
    qa = jnp.asarray(rng.randn(b, q, c).astype(np.float32))
    ka = jnp.asarray(rng.randn(b, kv, c).astype(np.float32))
    va = jnp.asarray(rng.randn(b, kv, c).astype(np.float32))

    out_f, w_f = mha(p, qa, ka, va, h, fused=True)
    out_u, _ = mha(p, qa, ka, va, h, fused=False)
    assert w_f is None
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=2e-5)

    # masked call must fall back to the exact XLA path (identical results)
    mask = jnp.zeros((q, kv), bool).at[:, -7:].set(True)
    out_fm, _ = mha(p, qa, ka, va, h, attn_mask=mask, fused=True)
    out_um, _ = mha(p, qa, ka, va, h, attn_mask=mask, fused=False)
    np.testing.assert_allclose(np.asarray(out_fm), np.asarray(out_um))

    # weights request falls back and still returns head-mean weights
    out_fw, w = mha(p, qa, ka, va, h, return_weights=True, fused=True)
    assert w is not None and w.shape == (b, q, kv)


def test_decoder_layer_fused_matches_unfused():
    """Full decoder layer (self-attn over query+memory, cross-attn to
    tokens, FFN) with fused_attn on == off at f32."""
    from toc3d_tpu.models.petr_transformer import (DecoderConfig,
                                                   init_decoder_layer,
                                                   decoder_layer_forward)
    rng = np.random.RandomState(3)
    c, h = 64, 2
    cfg_f = DecoderConfig(embed_dims=c, num_heads=h, num_layers=1,
                          feedforward_channels=128, fused_attn=True)
    cfg_u = DecoderConfig(embed_dims=c, num_heads=h, num_layers=1,
                          feedforward_channels=128, fused_attn=False)
    p = init_decoder_layer(jax.random.PRNGKey(1), cfg_f)
    f32 = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.3
    query, qpos = f32(1, 30, c), f32(1, 30, c)
    key = val = f32(1, 200, c)
    kpos = f32(1, 200, c)
    tmem, tpos = f32(1, 12, c), f32(1, 12, c)
    args = (query, key, val, qpos, kpos, tmem, tpos, None)
    out_f, _ = decoder_layer_forward(p, cfg_f, *args)
    out_u, _ = decoder_layer_forward(p, cfg_u, *args)
    np.testing.assert_allclose(np.asarray(out_f), np.asarray(out_u),
                               atol=3e-5)
