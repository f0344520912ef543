"""Whole-decoder-layer megakernel (ops/pallas/decoder_layer.py) —
interpret-mode parity against the XLA decoder_layer_forward path it
replaces (reference petr_transformer.py:653-760 eval configuration)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.models.petr_transformer import (DecoderConfig,
                                               init_decoder_layer,
                                               decoder_layer_forward)
from toc3d_tpu.ops.pallas import decoder_layer as dl


def _mk(b, q, kv, m, c, h, ffc, seed=0):
    cfg = DecoderConfig(embed_dims=c, num_heads=h, num_layers=1,
                        feedforward_channels=ffc, dropout=0.0,
                        fused_attn=False)
    p = init_decoder_layer(jax.random.PRNGKey(seed), cfg)
    rng = np.random.RandomState(seed)
    t = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32)) * 0.2
    return cfg, p, dict(query=t(b, q, c), key=t(b, kv, c),
                        query_pos=t(b, q, c), key_pos=t(b, kv, c),
                        temp_memory=t(b, m, c), temp_pos=t(b, m, c))


@pytest.mark.parametrize("b,q,kv,m,c,h,ffc", [
    (1, 12, 300, 8, 32, 2, 64),    # unaligned q/m (pad + key-mask path)
    (1, 16, 256, 8, 32, 2, 64),    # q aligned, kv block-aligned
    (2, 9, 140, 4, 64, 4, 96),     # batch > 1, odd everything
])
def test_fused_layer_matches_xla(b, q, kv, m, c, h, ffc):
    cfg, p, a = _mk(b, q, kv, m, c, h, ffc)
    ref, _ = decoder_layer_forward(p, cfg, a["query"], a["key"], a["key"],
                                   a["query_pos"], a["key_pos"],
                                   a["temp_memory"], a["temp_pos"], None)
    out = dl.fused_decoder_layer(p, a["query"], a["key"], a["key"],
                                 a["query_pos"], a["key_pos"],
                                 a["temp_memory"], a["temp_pos"], h,
                                 interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)


def test_routing_via_decoder_layer_forward():
    """cfg.fused_attn routes through the megakernel on CPU only under the
    FORCE_FUSED_ON_CPU test hook, and falls back for mask/weights/rng."""
    b, q, kv, m, c, h, ffc = 1, 12, 300, 8, 32, 2, 64
    cfg, p, a = _mk(b, q, kv, m, c, h, ffc)
    fused_cfg = DecoderConfig(embed_dims=c, num_heads=h, num_layers=1,
                              feedforward_channels=ffc, dropout=0.0,
                              fused_attn=False, fused_layer=True)
    ref, _ = decoder_layer_forward(p, cfg, a["query"], a["key"], a["key"],
                                   a["query_pos"], a["key_pos"],
                                   a["temp_memory"], a["temp_pos"], None)
    dl.FORCE_FUSED_ON_CPU = True
    try:
        out, w = decoder_layer_forward(p, fused_cfg, a["query"], a["key"],
                                       a["key"], a["query_pos"], a["key_pos"],
                                       a["temp_memory"], a["temp_pos"], None)
        assert w is None
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=3e-5)
        # mask request must take the XLA fallback (DN training config)
        mask = jnp.zeros((q + m, q + m), bool)[:q + m, :q + m]
        out2, _ = decoder_layer_forward(
            p, fused_cfg, a["query"], a["key"], a["key"], a["query_pos"],
            a["key_pos"], a["temp_memory"], a["temp_pos"],
            jnp.zeros((q, q + m), bool))
        ref2, _ = decoder_layer_forward(
            p, cfg, a["query"], a["key"], a["key"], a["query_pos"],
            a["key_pos"], a["temp_memory"], a["temp_pos"],
            jnp.zeros((q, q + m), bool))
        np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                                   atol=1e-6)
    finally:
        dl.FORCE_FUSED_ON_CPU = False
