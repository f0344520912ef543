"""PETRHeadDN head variant + multi-frame training losses."""
import numpy as np
import jax
import jax.numpy as jnp

from toc3d_tpu.configs import get_config
from toc3d_tpu.models.petr_transformer import DecoderConfig
from toc3d_tpu.models.petr_head_dn import (petr_head_dn_config,
                                           init_petr_head_dn,
                                           petr_head_dn_forward)
from toc3d_tpu.core.dn import prepare_for_dn, dn_reference_points


def tiny_dn_cfg():
    return petr_head_dn_config(
        embed_dims=32, in_channels=16, num_query=12, depth_num=32,
        dn_max_gt=4,
        decoder=DecoderConfig(embed_dims=32, num_heads=2, num_layers=2,
                              feedforward_channels=64))


def _data(b, n):
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1e3
    return {"intrinsics": jnp.asarray(intr), "img2lidar": jnp.asarray(eye),
            "pad_shape": (64, 128)}


def test_petr_head_dn_forward_and_dn():
    cfg = tiny_dn_cfg()
    params = jax.jit(lambda k: init_petr_head_dn(k, cfg))(
        jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    feats = jnp.asarray(rng.randn(2, 2, 4, 8, 16).astype(np.float32))
    data = _data(2, 2)

    outs = jax.jit(lambda p, f: petr_head_dn_forward(p, cfg, f, data))(
        params, feats)
    assert outs["all_cls_scores"].shape == (2, 2, 12, 10)
    assert np.isfinite(np.asarray(outs["all_bbox_preds"])).all()

    # with denoising
    boxes = rng.randn(2, 4, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1
    dn = prepare_for_dn(jax.random.PRNGKey(1), cfg, jnp.asarray(boxes),
                        jnp.asarray(rng.randint(0, 10, (2, 4))),
                        jnp.asarray(np.ones((2, 4), bool)))
    dn_head = {"padded_reference_points": dn_reference_points(
                   dn, params["reference_points"], 2),
               "attn_mask": dn["attn_mask"], "pad_size": dn["pad_size"]}
    outs = jax.jit(lambda p, f: petr_head_dn_forward(p, cfg, f, data,
                                                     dn=dn_head))(
        params, feats)
    assert outs["all_cls_scores"].shape == (2, 2, 12, 10)
    assert outs["dn_cls_scores"].shape == (2, 2, 40, 10)
    assert np.isfinite(np.asarray(outs["dn_bbox_preds"])).all()


def test_multiframe_losses():
    from toc3d_tpu.runtime.train import compute_losses_multiframe
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.models.streampetr_head import init_memory
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import make_batch

    cfg = get_config("tiny")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    t = 3
    frames = [make_batch(rng, 1, 2, *cfg.pad_shape) for _ in range(t)]
    batch = {k: jnp.stack([f[k] for f in frames], axis=1)
             for k in frames[0]}
    memory = init_memory(1, cfg.head)
    total, (losses, new_memory) = jax.jit(
        lambda p, m, b, k: compute_losses_multiframe(p, cfg, m, b, k,
                                                     remat=False))(
        params, memory, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(total))
    # losses only from the last num_frame_losses (=1) frame
    assert all(k.startswith("frame_2_") for k in losses)
    assert float(jnp.abs(new_memory.embedding).sum()) > 0


def test_num_frame_backbone_grads_separates_backbone_from_head():
    """petr3d.py:262-308: history frames can feed head losses while their
    backbone runs in no_grad — backbone grads must be exactly zero when
    num_frame_backbone_grads excludes every loss frame, head grads flow."""
    from dataclasses import replace
    from toc3d_tpu.runtime.train import compute_losses_multiframe
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.models.streampetr_head import init_memory
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import make_batch

    cfg = replace(get_config("tiny"), num_frame_backbone_grads=0,
                  num_frame_head_grads=2, num_frame_losses=2)
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    frames = [make_batch(rng, 1, 2, *cfg.pad_shape) for _ in range(2)]
    batch = {k: jnp.stack([f[k] for f in frames], axis=1) for k in frames[0]}
    memory = init_memory(1, cfg.head)

    def loss_fn(p):
        total, _ = compute_losses_multiframe(p, cfg, memory, batch,
                                             jax.random.PRNGKey(1),
                                             remat=False)
        return total

    grads = jax.jit(jax.grad(loss_fn))(params)
    bb_norm = float(sum(jnp.abs(g).sum()
                        for g in jax.tree_util.tree_leaves(
                            grads["img_backbone"])))
    head_norm = float(sum(jnp.abs(g).sum()
                          for g in jax.tree_util.tree_leaves(
                              grads["pts_bbox_head"])))
    roi_norm = float(sum(jnp.abs(g).sum()
                         for g in jax.tree_util.tree_leaves(
                             grads["img_roi_head"])))
    assert bb_norm == 0.0
    assert head_norm > 0.0 and roi_norm > 0.0

    # with backbone grads enabled on the last frame, they flow again
    cfg1 = replace(cfg, num_frame_backbone_grads=1)

    def loss_fn1(p):
        total, _ = compute_losses_multiframe(p, cfg1, memory, batch,
                                             jax.random.PRNGKey(1),
                                             remat=False)
        return total

    grads1 = jax.jit(jax.grad(loss_fn1))(params)
    bb_norm1 = float(sum(jnp.abs(g).sum()
                         for g in jax.tree_util.tree_leaves(
                             grads1["img_backbone"])))
    assert bb_norm1 > 0.0
