"""view_scan: the train-time lax.scan over camera views must compute the
same function as the batched (B*N)-row backbone pass.

The backbone never mixes views (window/global attention, selector scoring
and the token masks are all per-row), so scanning the view axis only
sequentializes lifetimes — outputs and parameter gradients must match the
unscanned path exactly on the deterministic (rng=None) path. The train
path draws per-view RNG keys (fold-split), so stochastic draws differ
from the unscanned single batched draw by construction — covered by a
smoke test instead of equality.
"""
import numpy as np
import jax
import jax.numpy as jnp

from toc3d_tpu.models.detector import extract_img_feat, init_detector
from toc3d_tpu.models.streampetr_head import init_memory
from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                     make_train_step, auto_view_scan)
from test_models_smoke import tiny_detector, make_frame
from test_train import make_batch


def _setup(b=1, n=3):
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    memory = init_memory(b, cfg.head)
    frame = make_frame(b=b, n=n, prev_exists=1.0)
    return cfg, params, memory, frame


def test_view_scan_matches_unscanned_eval():
    cfg, params, memory, frame = _setup()

    def run(view_scan):
        return extract_img_feat(params, cfg, frame["img"], memory, frame,
                                rng=None, remat=False, fused_ok=False,
                                view_scan=view_scan)

    feats0, aux0 = jax.jit(lambda: run(False))()
    feats1, aux1 = jax.jit(lambda: run(True))()
    np.testing.assert_allclose(np.asarray(feats0), np.asarray(feats1),
                               atol=1e-5, rtol=1e-5)
    flat0 = jax.tree_util.tree_leaves(aux0)
    flat1 = jax.tree_util.tree_leaves(aux1)
    assert len(flat0) == len(flat1) and len(flat0) > 0
    for a, b_ in zip(flat0, flat1):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_view_scan_grads_match_unscanned():
    cfg, params, memory, frame = _setup()

    def loss(p, view_scan):
        feats, _ = extract_img_feat(p, cfg, frame["img"], memory, frame,
                                    rng=None, remat=True, fused_ok=False,
                                    view_scan=view_scan)
        return jnp.sum(feats.astype(jnp.float32) ** 2)

    g0 = jax.jit(jax.grad(lambda p: loss(p, False)))(params)
    g1 = jax.jit(jax.grad(lambda p: loss(p, True)))(params)
    leaves0, tree0 = jax.tree_util.tree_flatten(g0)
    leaves1, tree1 = jax.tree_util.tree_flatten(g1)
    assert tree0 == tree1
    for a, b_ in zip(leaves0, leaves1):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=2e-3, rtol=1e-3)


def test_train_step_view_scan_runs_and_updates():
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=100)
    state = init_train_state(params, tx, 1, cfg)
    step = jax.jit(make_train_step(cfg, tx, view_scan=True))
    batch = make_batch(np.random.RandomState(0), 1, 2, *cfg.pad_shape)
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
    state2, metrics = step(state1, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))
    d = float(jnp.abs(state2.params["img_backbone"]["patch_embed"]["w"]
                      - state.params["img_backbone"]["patch_embed"]["w"]).max())
    assert d > 0


def test_train_step_no_remat_matches_remat():
    # remat is a memory/speed trade, not a semantic one: the first update
    # from the remat and no-remat steps must match to numerical noise.
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=100)
    batch = make_batch(np.random.RandomState(0), 1, 2, *cfg.pad_shape)

    def one(remat):
        state = init_train_state(params, tx, 1, cfg)
        step = jax.jit(make_train_step(cfg, tx, view_scan=True, remat=remat))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["total_loss"]), state.params

    l0, p0 = one(True)
    l1, p1 = one(False)
    assert np.isfinite(l0) and np.isfinite(l1)
    np.testing.assert_allclose(l0, l1, rtol=1e-4)
    for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                     jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-4, rtol=5e-3)


def test_auto_view_scan_policy():
    cfg = tiny_detector()
    assert auto_view_scan(cfg) is False          # 64x128
    import dataclasses
    big = dataclasses.replace(cfg, pad_shape=(640, 1600))
    assert auto_view_scan(big) is True


def test_view_scan_chunked_matches_unscanned_eval():
    # view_scan=<int> scans CHUNKS of views; same function, b-major packing
    cfg, params, memory, frame = _setup(n=4)

    def run(view_scan):
        return extract_img_feat(params, cfg, frame["img"], memory, frame,
                                rng=None, remat=False, fused_ok=False,
                                view_scan=view_scan)

    feats0, aux0 = jax.jit(lambda: run(False))()
    feats2, aux2 = jax.jit(lambda: run(2))()
    np.testing.assert_allclose(np.asarray(feats0), np.asarray(feats2),
                               atol=1e-5, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(aux0),
                     jax.tree_util.tree_leaves(aux2)):
        assert a.shape == b_.shape
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=1e-5, rtol=1e-5)


def test_view_scan_chunk_must_divide():
    cfg, params, memory, frame = _setup(n=3)
    import pytest
    with pytest.raises(ValueError, match="must divide"):
        jax.eval_shape(lambda: extract_img_feat(
            params, cfg, frame["img"], memory, frame, rng=None,
            fused_ok=False, view_scan=2))


def test_attn_chunk_matches_unchunked():
    # bounded-memory attention is the same math: outputs and grads equal
    # (the chunk count here forces a zero-padded tail window)
    cfg, params, memory, frame = _setup(n=3)

    def loss(p, attn_chunk):
        feats, _ = extract_img_feat(p, cfg, frame["img"], memory, frame,
                                    rng=None, remat=True, fused_ok=False,
                                    attn_chunk=attn_chunk)
        return jnp.sum(feats.astype(jnp.float32) ** 2)

    (l0, g0) = jax.jit(jax.value_and_grad(lambda p: loss(p, None)))(params)
    (l1, g1) = jax.jit(jax.value_and_grad(lambda p: loss(p, 4)))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=2e-3, rtol=1e-3)


def test_train_step_attn_chunk_matches_plain():
    # full train step with attn_chunk: identical first update
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    tx = make_optimizer(params, total_iters=100)
    batch = make_batch(np.random.RandomState(0), 1, 2, *cfg.pad_shape)

    def one(attn_chunk):
        state = init_train_state(params, tx, 1, cfg)
        step = jax.jit(make_train_step(cfg, tx, view_scan=False,
                                       attn_chunk=attn_chunk))
        state, metrics = step(state, batch, jax.random.PRNGKey(1))
        return float(metrics["total_loss"]), state.params

    l0, p0 = one(None)
    l1, p1 = one(2)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(p0),
                     jax.tree_util.tree_leaves(p1)):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(b_, np.float32),
                                   atol=5e-4, rtol=5e-3)
