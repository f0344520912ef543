"""Pallas fused ViT-block kernels — interpret-mode correctness on the
CPU mesh (the real-TPU path is exercised by bench/eval runs)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.ops.rope import build_rope_table


def _block_params(key, c, hidden):
    from toc3d_tpu.models.eva_vit import init_block, EVAViTConfig
    cfg = EVAViTConfig(embed_dim=c, num_heads=2, mlp_ratio=hidden / c)
    return init_block(key, cfg)


def test_fused_full_block_matches_xla():
    """Megakernel full block == block_forward (interpret mode)."""
    from toc3d_tpu.ops.pallas.vit_block import fused_full_block
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig

    rng = np.random.RandomState(0)
    b, h, w, c, heads, ws = 2, 8, 12, 32, 2, 4
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    p = _block_params(jax.random.PRNGKey(0), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    ref = block_forward(p, x, cfg, ws, tables)
    out = fused_full_block(p, x, heads, ws, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    # no-rope + non-multiple spatial dims (padding path)
    x2 = x[:, :7, :11]
    ref2 = block_forward(p, x2, cfg, ws, None)
    out2 = fused_full_block(p, x2, heads, ws, None, interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_fused_compressed_block_matches_xla():
    """Megakernel token-compressed block == toc3d_block_forward
    (interpret mode), with and without the representative token."""
    from toc3d_tpu.ops.pallas.vit_block import fused_compressed_block
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(1)
    b, h, w, c, heads, ws = 2, 8, 8, 32, 2, 4
    p = _block_params(jax.random.PRNGKey(1), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    for use_rep in (True, False):
        cfg = ToC3DViTConfig(
            embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
            pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
            use_represent_tokens=use_rep, rope_acc=True)
        ref = toc3d_block_forward(p, x, scores, cfg, ws, 0.5, tables)
        out = fused_compressed_block(p, x, scores, heads, ws, 0.5, tables,
                                     use_represent=use_rep, rope_acc=True,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_keep_count_mxu_align():
    from toc3d_tpu.models.token_select import keep_count
    # reference semantics when off
    assert keep_count(256, 0.5) == 128
    assert keep_count(256, 0.4) == 102
    # the canonical pessimal case: ws=16 / ratio .5 with a rep token
    # (k+1 = 129 -> one over the 128-lane tile) drops one token
    assert keep_count(256, 0.5, n_rep=1, mxu_align=True) == 127
    # no rep token: k = 128 tiles exactly, no adjustment
    assert keep_count(256, 0.5, n_rep=0, mxu_align=True) == 128
    # non-pessimal ratios unchanged
    assert keep_count(256, 0.4, n_rep=1, mxu_align=True) == 102
    assert keep_count(256, 0.3, n_rep=1, mxu_align=True) == 76
    assert keep_count(400, 0.5, n_rep=1, mxu_align=True) == 200
    # never drops below 1
    assert keep_count(2, 0.5, n_rep=0, mxu_align=True) == 1


def test_fused_compressed_block_align_k_matches_xla():
    """mxu_align_k at a shape where it fires (ws=16, ratio .5 -> k=127):
    kernel (interpret) == XLA block path, and both differ from the
    unaligned selection only by the one dropped token."""
    from toc3d_tpu.ops.pallas.vit_block import fused_compressed_block
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(3)
    b, h, w, c, heads, ws = 1, 16, 16, 32, 2, 16
    p = _block_params(jax.random.PRNGKey(3), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    cfg = ToC3DViTConfig(
        embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
        pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
        use_represent_tokens=True, rope_acc=True, mxu_align_k=True)
    ref = toc3d_block_forward(p, x, scores, cfg, ws, 0.5, tables)
    out = fused_compressed_block(p, x, scores, heads, ws, 0.5, tables,
                                 use_represent=True, rope_acc=True,
                                 interpret=True, align_k=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    # aligned selection differs from strict-parity selection
    cfg_off = ToC3DViTConfig(
        embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
        pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
        use_represent_tokens=True, rope_acc=True, mxu_align_k=False)
    ref_off = toc3d_block_forward(p, x, scores, cfg_off, ws, 0.5, tables)
    assert not np.allclose(np.asarray(ref), np.asarray(ref_off))


def test_fused_blocks_flat_fallback_matches_xla(monkeypatch):
    """ws % 8 != 0 normally takes the stripe path; the flat
    window-partition fallback must produce the same results (both full and
    compressed)."""
    import toc3d_tpu.ops.pallas.vit_block as vb
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    monkeypatch.setattr(vb, "FORCE_FLAT_LAYOUT", True)
    rng = np.random.RandomState(7)
    b, h, w, c, heads, ws = 2, 7, 11, 32, 2, 4
    p = _block_params(jax.random.PRNGKey(4), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    ref = block_forward(p, x, cfg, ws, tables)
    out = vb.fused_full_block(p, x, heads, ws, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)

    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    tcfg = ToC3DViTConfig(
        embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
        pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
        use_represent_tokens=True, rope_acc=True)
    ref2 = toc3d_block_forward(p, x, scores, tcfg, ws, 0.5, tables)
    out2 = vb.fused_compressed_block(p, x, scores, heads, ws, 0.5, tables,
                                     use_represent=True, rope_acc=True,
                                     interpret=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2),
                               atol=2e-5, rtol=2e-5)


def test_trainable_fused_blocks_grad_matches_xla():
    """custom-VJP wrappers: kernel forward (interpret), gradients must equal
    the XLA path's (the backward re-derives through the XLA body)."""
    from toc3d_tpu.ops.pallas.vit_block import (
        make_trainable_full_block, make_trainable_compressed_block)
    from toc3d_tpu.models.eva_vit import _block_forward_xla, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(3)
    b, h, w, c, heads, ws = 2, 8, 8, 32, 2, 4
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    p = _block_params(jax.random.PRNGKey(2), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    xla_fn = lambda p_, x_, t_: _block_forward_xla(p_, x_, cfg, ws,
                                                   t_ if t_ else None)
    f0 = make_trainable_full_block(xla_fn, heads, ws)
    f = lambda p_, x_: f0(p_, x_, tuple(tables))

    def loss_fused(p_, x_):
        return jnp.sum(f(p_, x_) ** 2)

    def loss_xla(p_, x_):
        return jnp.sum(xla_fn(p_, x_, tuple(tables)) ** 2)

    gf = jax.grad(loss_fused, argnums=(0, 1))(p, x)
    gx = jax.grad(loss_xla, argnums=(0, 1))(p, x)
    for a, bb in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)

    # compressed variant: grads flow to params, tokens AND scores
    tcfg = ToC3DViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                          window_size=ws, pruning_loc=(0,),
                          token_ratio=(0.5,), global_attn_indexes=(9,))
    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    xla_c = lambda p_, x_, s_, t_: toc3d_block_forward(
        p_, x_, s_, tcfg, ws, 0.5, t_ if t_ else None)
    fc0 = make_trainable_compressed_block(xla_c, heads, ws, 0.5, True, True)
    fc = lambda p_, x_, s_: fc0(p_, x_, s_, tuple(tables))
    gf = jax.grad(lambda p_, x_, s_: jnp.sum(fc(p_, x_, s_) ** 2),
                  argnums=(0, 1, 2))(p, x, scores)
    gx = jax.grad(lambda p_, x_, s_: jnp.sum(
        xla_c(p_, x_, s_, tuple(tables)) ** 2),
                  argnums=(0, 1, 2))(p, x, scores)
    for a, bb in zip(jax.tree_util.tree_leaves(gf),
                     jax.tree_util.tree_leaves(gx)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)

    # REGRESSION (train-on-TPU): the wrappers must survive jax.checkpoint
    # inside an outer jit'd grad — rope tables used to be closure-captured
    # by the custom VJP and leaked as tracers under remat
    # (UnexpectedTracerError in the ToC3D-Faster train step, layer 0).
    def remat_loss(p_, x_):
        y = jax.checkpoint(lambda pp, xx, tt: f0(pp, xx, tt))(
            p_, x_, tuple(tables))
        return jnp.sum(y ** 2)

    g_remat = jax.jit(jax.grad(remat_loss, argnums=(0, 1)))(p, x)
    for a, bb in zip(jax.tree_util.tree_leaves(g_remat),
                     jax.tree_util.tree_leaves(gx_full := jax.grad(
                         loss_xla, argnums=(0, 1))(p, x))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                   atol=1e-4, rtol=1e-4)


def test_fused_blocks_sanitize_path_matches_xla():
    """ws%8==0 with h/w NOT multiples of ws takes the image-layout block
    path with in-kernel zero-padding (sanitize_hw) — the production
    1600x800 regime (50x100 grid at ws=16). The kernels rely on Pallas
    OOB-read-then-mask / OOB-store-drop semantics there; pin interpret-mode
    parity for both the full and the compressed kernel (ADVICE r2)."""
    from toc3d_tpu.ops.pallas.vit_block import (fused_full_block,
                                                fused_compressed_block)
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(7)
    b, h, w, c, heads, ws = 2, 10, 12, 32, 2, 8
    assert ws % 8 == 0 and h % ws and w % ws
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    p = _block_params(jax.random.PRNGKey(5), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    for t in (tables, None):
        ref = block_forward(p, x, cfg, ws, t)
        out = fused_full_block(p, x, heads, ws, t, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    for use_rep in (True, False):
        tcfg = ToC3DViTConfig(
            embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
            pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
            use_represent_tokens=use_rep, rope_acc=True)
        ref = toc3d_block_forward(p, x, scores, tcfg, ws, 0.5, tables)
        out = fused_compressed_block(p, x, scores, heads, ws, 0.5, tables,
                                     use_represent=use_rep, rope_acc=True,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)


def test_fused_blocks_ws8_stripe_matches_xla(monkeypatch):
    """STRIPE_WS8_* routes ws%8==0 layers through the stripe kernels
    (whole window-rows per grid step, matmuls batched over nwj windows).
    Must be bit-compatible with the image-layout path's semantics: pin
    parity vs the XLA blocks on non-multiple h/w (sanitize + width pad)."""
    import toc3d_tpu.ops.pallas.vit_block as vb
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    monkeypatch.setattr(vb, "STRIPE_WS8_FULL", True)
    monkeypatch.setattr(vb, "STRIPE_WS8_COMPRESSED", True)
    rng = np.random.RandomState(11)
    b, h, w, c, heads, ws = 2, 10, 20, 32, 2, 8
    assert ws % 8 == 0 and h % ws and w % ws  # sanitize + width-pad path
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    p = _block_params(jax.random.PRNGKey(6), c, 64)
    x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    tables = build_rope_table(c // heads // 2, ws, ws)

    for t in (tables, None):
        ref = block_forward(p, x, cfg, ws, t)
        out = vb.fused_full_block(p, x, heads, ws, t, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
    for use_rep in (True, False):
        tcfg = ToC3DViTConfig(
            embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
            pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
            use_represent_tokens=use_rep, rope_acc=True)
        ref = toc3d_block_forward(p, x, scores, tcfg, ws, 0.5, tables)
        out = vb.fused_compressed_block(p, x, scores, heads, ws, 0.5,
                                        tables, use_represent=use_rep,
                                        rope_acc=True, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)

    # multiple-of-ws dims too (no sanitize): exact-cover stripe
    x3 = x[:, :8, :16]
    ref3 = block_forward(p, x3, cfg, ws, tables)
    out3 = vb.fused_full_block(p, x3, heads, ws, tables, interpret=True)
    np.testing.assert_allclose(np.asarray(out3), np.asarray(ref3),
                               atol=2e-5, rtol=2e-5)


def test_int8_quantized_blocks_close_to_float():
    """Serving int8 path: quantize_block_params (per-output-channel weights)
    + in-kernel dynamic per-row activation quantization must track the f32
    XLA path within int8 error bounds, in every kernel layout (image ws=8,
    stripe ws=4), full + compressed. Also pins the XLA-path guard on
    quantized params."""
    from toc3d_tpu.ops.pallas.vit_block import (
        fused_full_block, fused_compressed_block, quantize_block_params,
        is_quantized)
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(11)
    b, c, heads = 2, 32, 2
    p = _block_params(jax.random.PRNGKey(6), c, 64)
    pq = quantize_block_params(p, heads)
    assert is_quantized(pq) and not is_quantized(p)
    assert pq["attn"]["q_proj"]["w"].dtype == jnp.int8

    def err(a, r):
        a, r = np.asarray(a, np.float64), np.asarray(r, np.float64)
        return np.mean(np.abs(a - r)) / (np.mean(np.abs(r)) + 1e-9)

    for ws, (h, w) in ((8, (10, 12)), (4, (8, 12))):
        cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                           window_size=ws)
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        tables = build_rope_table(c // heads // 2, ws, ws)
        ref = block_forward(p, x, cfg, ws, tables)
        out = fused_full_block(pq, x, heads, ws, tables, interpret=True)
        assert err(out, ref) < 0.02, (ws, err(out, ref))

        scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
        tcfg = ToC3DViTConfig(
            embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
            pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
            use_represent_tokens=True, rope_acc=True)
        ref2 = toc3d_block_forward(p, x, scores, tcfg, ws, 0.5, tables)
        out2 = fused_compressed_block(pq, x, scores, heads, ws, 0.5, tables,
                                      use_represent=True, rope_acc=True,
                                      interpret=True)
        assert err(out2, ref2) < 0.02, (ws, err(out2, ref2))

    # quantized params must never silently run through the XLA block path
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=8)
    x = jnp.asarray(rng.randn(b, 8, 8, c).astype(np.float32))
    with pytest.raises(ValueError, match="int8-quantized"):
        block_forward(pq, x, cfg, 8, None)


def test_int8_static_calibration_matches_dynamic():
    """Static activation scales (ops/int8_calib site probes -> amax/127,
    quantize_block_params(act_scales=...)) must track the f32 reference as
    closely as the dynamic per-row path on the calibration input — per-site
    amax quantization strictly coarsens rows whose own amax is smaller, so
    the bound is the same order, and static-vs-dynamic outputs must agree
    tightly. Full + compressed kernels, image and stripe layouts."""
    from toc3d_tpu.ops.pallas.vit_block import (
        fused_full_block, fused_compressed_block, quantize_block_params,
        is_quantized)
    from toc3d_tpu.ops.int8_calib import (full_block_site_amax,
                                          compressed_block_site_amax)
    from toc3d_tpu.ops.pallas.vit_block import _ACT_SITES
    from toc3d_tpu.models.eva_vit import block_forward, EVAViTConfig
    from toc3d_tpu.models.toc3d_vit import (toc3d_block_forward,
                                            ToC3DViTConfig)

    rng = np.random.RandomState(12)
    b, c, heads = 2, 32, 2
    p = _block_params(jax.random.PRNGKey(7), c, 64)
    pq_dyn = quantize_block_params(p, heads)
    assert is_quantized(pq_dyn) == "dynamic"

    def err(a, r):
        a, r = np.asarray(a, np.float64), np.asarray(r, np.float64)
        return np.mean(np.abs(a - r)) / (np.mean(np.abs(r)) + 1e-9)

    for ws, (h, w) in ((8, (10, 12)), (4, (8, 12))):
        cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                           window_size=ws)
        x = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
        tables = build_rope_table(c // heads // 2, ws, ws)

        amax = full_block_site_amax(p, x, heads, ws, tables)
        scales = {k: float(amax[k]) / 127.0 for k in _ACT_SITES}
        pq = quantize_block_params(p, heads, act_scales=scales)
        assert is_quantized(pq) == "static"

        ref = block_forward(p, x, cfg, ws, tables)
        out_s = fused_full_block(pq, x, heads, ws, tables, interpret=True)
        out_d = fused_full_block(pq_dyn, x, heads, ws, tables,
                                 interpret=True)
        assert err(out_s, ref) < 0.03, (ws, err(out_s, ref))
        assert err(out_s, out_d) < 0.02, (ws, err(out_s, out_d))

        scores = jnp.asarray(rng.randn(b, h * w).astype(np.float32))
        tcfg = ToC3DViTConfig(
            embed_dim=c, num_heads=heads, mlp_ratio=2.0, window_size=ws,
            pruning_loc=(0,), token_ratio=(0.5,), global_attn_indexes=(9,),
            use_represent_tokens=True, rope_acc=True)
        amax2 = compressed_block_site_amax(p, x, scores, tcfg, ws, 0.5,
                                           tables)
        scales2 = {k: float(amax2[k]) / 127.0 for k in _ACT_SITES}
        pq2 = quantize_block_params(p, heads, act_scales=scales2)
        ref2 = toc3d_block_forward(p, x, scores, tcfg, ws, 0.5, tables)
        out2 = fused_compressed_block(pq2, x, scores, heads, ws, 0.5,
                                      tables, use_represent=True,
                                      rope_acc=True, interpret=True)
        assert err(out2, ref2) < 0.03, (ws, err(out2, ref2))


def test_int8_calibrate_attach_precast():
    """calibrate_act_scales on the tiny detector: scales are positive and
    finite for every block/site, and attach_act_scales threads them through
    the detector precast so every quantized block carries static scales
    (is_quantized == 'static'). The kernel-level static-vs-float accuracy
    is pinned by test_int8_static_calibration_matches_dynamic; the fused
    e2e path needs a TPU backend (the XLA block path rejects quantized
    params by design)."""
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.ops.int8_calib import (calibrate_act_scales,
                                          attach_act_scales)
    from toc3d_tpu.ops.pallas.vit_block import _ACT_SITES, is_quantized
    from toc3d_tpu.models.detector import (init_detector,
                                           _precast_backbone_params)
    import dataclasses

    import bench as bench_mod

    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(3)
    h, w = cfg.pad_shape
    frames = [bench_mod.make_frame(rng, 1, 2, h, w, float(i > 0))
              for i in range(2)]
    scales = calibrate_act_scales(params, cfg, frames)
    assert len(scales) == cfg.backbone.depth
    for s in scales:
        for k in _ACT_SITES:
            v = float(s[k])
            assert np.isfinite(v) and v > 0.0, (k, v)

    qcfg = dataclasses.replace(
        cfg, backbone=dataclasses.replace(cfg.backbone, quant="int8"))
    p_static = attach_act_scales(params, scales)
    pre = _precast_backbone_params(p_static, qcfg)
    for blk in pre["img_backbone"]["blocks"]:
        assert is_quantized(blk) == "static"
        for k in _ACT_SITES:
            assert blk["act_scales"][k].shape == (1, 1)
    assert "act_scales" not in pre["img_backbone"]
    # without attach, the same precast stays dynamic
    pre_d = _precast_backbone_params(params, qcfg)
    assert is_quantized(pre_d["img_backbone"]["blocks"][0]) == "dynamic"
