"""End-to-end smoke tests: tiny-config backbone, head, and streaming
inference step (shape/state sanity; numerics covered elsewhere)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.models.eva_vit import EVAViTConfig, init_eva_vit, eva_vit_forward
from toc3d_tpu.models.toc3d_vit import (ToC3DViTConfig, init_toc3d_vit,
                                        toc3d_vit_forward)
from toc3d_tpu.models.petr_transformer import DecoderConfig
from toc3d_tpu.models.streampetr_head import StreamPETRHeadConfig
from toc3d_tpu.models.neck import CPFPNConfig
from toc3d_tpu.models.focal_head import (FocalHeadConfig, init_focal_head,
                                         focal_head_forward)
from toc3d_tpu.models.streampetr_head import location_grid
from toc3d_tpu.models.detector import (DetectorConfig, DetectorState,
                                       init_detector, init_state, infer_step)


def tiny_backbone(**kw):
    return EVAViTConfig(
        img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
        window_size=4, global_window_size=4, global_attn_indexes=(1, 3),
        pretrain_img_size=32, **kw)


def tiny_toc3d(**kw):
    defaults = dict(
        img_size=64, patch_size=16, embed_dim=32, depth=4, num_heads=2,
        window_size=4, global_window_size=4, global_attn_indexes=(1, 3),
        pretrain_img_size=32, pruning_loc=(2,), token_ratio=(0.5,),
        pruning_num_queries=4, query_dim=32)
    defaults.update(kw)
    return ToC3DViTConfig(**defaults)


def tiny_head():
    return StreamPETRHeadConfig(
        embed_dims=32, in_channels=16, num_query=12, memory_len=16,
        topk_proposals=4, num_propagated=4, depth_num=32, max_decode=10,
        decoder=DecoderConfig(embed_dims=32, num_heads=2, num_layers=2,
                              feedforward_channels=64),
        dn_max_gt=4)


def tiny_detector():
    return DetectorConfig(
        backbone=tiny_toc3d(),
        neck=CPFPNConfig(in_channels=(32,), out_channels=16),
        head=tiny_head(),
        focal=FocalHeadConfig(num_classes=10, in_channels=16, embed_dims=32),
        pad_shape=(64, 128),
    )


def make_frame(b=1, n=2, h=64, w=128, prev_exists=0.0, seed=0):
    rng = np.random.RandomState(seed)
    intr = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr[..., 0, 0] = 1000.0
    intr[..., 1, 1] = 1000.0
    return {
        "img": jnp.asarray(rng.randn(b, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "img2lidar": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))),
        "timestamp": jnp.full((b,), 0.5, jnp.float32),
        "ego_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "ego_pose_inv": jnp.asarray(
            np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "prev_exists": jnp.full((b,), prev_exists, jnp.float32),
    }


def test_eva_vit_forward_shapes():
    cfg = tiny_backbone()
    params = jax.jit(lambda k: init_eva_vit(k, cfg))(jax.random.PRNGKey(0))
    x = jnp.ones((2, 64, 128, 3))
    out = jax.jit(lambda p, x: eva_vit_forward(p, x, cfg))(params, x)
    assert out.shape == (2, 4, 8, 32)
    assert np.isfinite(np.asarray(out)).all()


def test_toc3d_vit_forward_shapes_and_aux():
    cfg = tiny_toc3d()
    params = jax.jit(lambda k: init_toc3d_vit(k, cfg))(jax.random.PRNGKey(0))
    b, n = 1, 2
    x = jnp.asarray(np.random.RandomState(0).randn(b * n, 64, 128, 3)
                    .astype(np.float32))
    motion_ctx = {
        "temp_queries": jnp.zeros((b, 4, 32)),
        "temp_ref_points": jnp.zeros((b, 4, 3)),
        "temp_vel": jnp.zeros((b, 4, 2)),
        "temp_timestamp": jnp.zeros((b, 4, 1)),
        "temp_ego_pose": jnp.tile(jnp.eye(4), (b, 4, 1, 1)),
        "ego_pose_inv": jnp.tile(jnp.eye(4), (b, 1, 1)),
    }
    out, aux = jax.jit(lambda p, x, m, pe: toc3d_vit_forward(p, x, cfg, m, pe))(
        params, x, motion_ctx, jnp.zeros((b,)))
    assert out.shape == (2, 4, 8, 32)
    assert len(aux["token_masks"]) == 1
    assert aux["token_masks"][0].shape == (2, 4, 8, 1)
    n_tok = 32
    assert aux["keep_idx"][0].shape == (2, n_tok // 2)
    assert np.isfinite(np.asarray(out)).all()


def test_toc3d_differs_from_zero_ratio():
    """Pruning with ratio<1 must change outputs vs the unpruned block path."""
    cfg = tiny_toc3d()
    cfg_full = tiny_toc3d(token_ratio=(1.0,))
    params = jax.jit(lambda k: init_toc3d_vit(k, cfg))(jax.random.PRNGKey(0))
    b, n = 1, 1
    x = jnp.asarray(np.random.RandomState(1).randn(n, 64, 128, 3)
                    .astype(np.float32))
    motion_ctx = {
        "temp_queries": jnp.zeros((b, 4, 32)),
        "temp_ref_points": jnp.zeros((b, 4, 3)),
        "temp_vel": jnp.zeros((b, 4, 2)),
        "temp_timestamp": jnp.zeros((b, 4, 1)),
        "temp_ego_pose": jnp.tile(jnp.eye(4), (b, 4, 1, 1)),
        "ego_pose_inv": jnp.tile(jnp.eye(4), (b, 1, 1)),
    }
    out1, _ = jax.jit(lambda p, x, m, pe: toc3d_vit_forward(p, x, cfg, m, pe))(
        params, x, motion_ctx, jnp.zeros((b,)))
    out2, _ = jax.jit(lambda p, x, m, pe: toc3d_vit_forward(p, x, cfg_full, m, pe))(
        params, x, motion_ctx, jnp.zeros((b,)))
    assert not np.allclose(np.asarray(out1), np.asarray(out2))


def test_focal_head_forward():
    cfg = FocalHeadConfig(in_channels=16, embed_dims=32)
    params = jax.jit(lambda k: init_focal_head(k, cfg))(jax.random.PRNGKey(0))
    feats = jnp.asarray(np.random.RandomState(2).randn(1, 2, 4, 8, 16)
                        .astype(np.float32))
    locs = location_grid(4, 8, 16, 64, 128)
    out = jax.jit(lambda p, f: focal_head_forward(p, cfg, f, locs, 1.0))(
        params, feats)
    assert out["enc_cls_scores"].shape == (2, 32, 10)
    assert out["enc_bbox_preds"].shape == (2, 32, 4)
    assert out["topk_indexes"].shape == (1, 64, 1)
    # ratio 1.0 -> a permutation of all tokens
    idx = np.sort(np.asarray(out["topk_indexes"][0, :, 0]))
    np.testing.assert_array_equal(idx, np.arange(64))


def test_infer_step_streaming():
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    state = init_state(1, cfg)

    step = jax.jit(lambda p, s, f: infer_step(p, cfg, s, f))
    state1, det1 = step(params, state, make_frame(prev_exists=0.0, seed=0))
    assert det1.bboxes.shape == (1, 10, 9)
    assert det1.scores.shape == (1, 10)
    assert det1.labels.shape == (1, 10)
    assert np.isfinite(np.asarray(det1.bboxes)).all()
    # memory bank must be written (non-zero embedding after first frame)
    assert np.abs(np.asarray(state1.memory.embedding)).sum() > 0

    # second frame, same scene
    state2, det2 = step(params, state1, make_frame(prev_exists=1.0, seed=1))
    assert np.isfinite(np.asarray(det2.bboxes)).all()
    # memory propagation should make results history-dependent:
    # same frame with a fresh state must differ
    state2b, det2b = step(params, init_state(1, cfg),
                          make_frame(prev_exists=0.0, seed=1))
    assert not np.allclose(np.asarray(det2.scores), np.asarray(det2b.scores))


def test_scene_reset_equals_fresh_state():
    """prev_exists=0 must make the step independent of carried state."""
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    step = jax.jit(lambda p, s, f: infer_step(p, cfg, s, f))

    state0 = init_state(1, cfg)
    state1, _ = step(params, state0, make_frame(prev_exists=0.0, seed=0))
    frame = make_frame(prev_exists=0.0, seed=3)
    _, det_carried = step(params, state1, frame)
    _, det_fresh = step(params, state0, frame)
    np.testing.assert_allclose(np.asarray(det_carried.scores),
                               np.asarray(det_fresh.scores), atol=1e-5)


def test_eval_mask_modes():
    """eval_mask='gumbel' (reference strict parity) is stochastic across
    seeds; 'hard' yields a 0/1 top-k mask; 'softmax' is deterministic."""
    from dataclasses import replace
    import jax
    import jax.numpy as jnp
    import numpy as np
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           extract_img_feat)
    from toc3d_tpu.models.toc3d_vit import toc3d_vit_forward

    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    state = init_state(1, cfg)
    rng = np.random.RandomState(0)
    h, w = cfg.pad_shape
    frame = {
        "img": jnp.asarray(rng.randn(1, 2, h, w, 3).astype(np.float32)),
        "prev_exists": jnp.ones((1,), jnp.float32),
        "ego_pose_inv": jnp.eye(4)[None],
    }

    def run(bb_cfg, mask_rng, p=None):
        c = replace(cfg, backbone=bb_cfg)
        if p is None:
            p = params
        feats, aux = extract_img_feat(p, c, frame["img"], state.memory,
                                      frame, mask_rng=mask_rng)
        return feats, aux

    bb = cfg.backbone
    f_det1, _ = run(bb, None)
    f_det2, _ = run(bb, None)
    assert np.allclose(np.asarray(f_det1), np.asarray(f_det2))

    # the mask feeds the NEXT selector's scoring (use_mask=True), so
    # stochasticity needs >= 2 pruning layers to reach the features
    bb_g = replace(bb, eval_mask="gumbel", global_attn_indexes=(3,),
                   pruning_loc=(1, 2), token_ratio=(0.5, 0.5))
    cfg_g = replace(cfg, backbone=bb_g)
    params_g = jax.jit(lambda k: init_detector(k, cfg_g))(
        jax.random.PRNGKey(0))
    f_g1, _ = run(bb_g, jax.random.PRNGKey(1), params_g)
    f_g2, _ = run(bb_g, jax.random.PRNGKey(2), params_g)
    assert not np.allclose(np.asarray(f_g1), np.asarray(f_g2))

    bb_h = replace(bb, eval_mask="hard")
    _, aux_h = run(bb_h, None)
    m = np.asarray(aux_h["token_masks"][0])
    assert set(np.unique(m)).issubset({0.0, 1.0})
    k = int(m.shape[1] * m.shape[2] * bb.token_ratio[0])
    assert int(m.sum()) == k * m.shape[0]
