"""Shard-local Hungarian under SPMD: auction-on-mesh == host-LAP.

VERDICT r2 weak #1: the host-LAP pure_callback inside an SPMD train program
gathers the whole (B, Q, G) cost tensor onto device 0 and broadcasts back
(XLA 'Involuntary full rematerialization'). The fix routes multi-device
runs through the device auction (core/auction.py), which is per-sample and
shard-local — matching the reference's per-rank-local scipy matching under
DDP (hungarian_assigner_3d.py:72-82). These tests pin that the mesh-sharded
auction reproduces the single-device host-LAP assignment and losses.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from toc3d_tpu.core.assigner import assign_3d, set_default_impl


def _inputs(b=8, q=64, c=10, g=8, seed=0):
    rng = np.random.RandomState(seed)
    bbox_pred = jnp.asarray(rng.randn(b, q, 10).astype(np.float32))
    cls_pred = jnp.asarray(rng.randn(b, q, c).astype(np.float32) * 2)
    gt = rng.randn(b, g, 9).astype(np.float32)
    gt[..., 3:6] = np.abs(gt[..., 3:6]) + 0.5
    gt_bboxes = jnp.asarray(gt)
    gt_labels = jnp.asarray(rng.randint(0, c, (b, g)))
    # ragged validity incl. an empty sample
    nv = rng.randint(0, g + 1, (b,))
    nv[0] = 0
    gt_valid = jnp.asarray(np.arange(g)[None] < nv[:, None])
    mc = jnp.asarray([1.0] * 8 + [0.2, 0.2], jnp.float32)
    return bbox_pred, cls_pred, gt_bboxes, gt_labels, gt_valid, mc


def teardown_module():
    set_default_impl(None)


def test_auction_under_mesh_matches_host_lap():
    args = _inputs()
    set_default_impl(None)
    ref = np.asarray(assign_3d(*args))  # CPU default: host-LAP callback

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    sharded = [jax.device_put(a, shard) if a.ndim >= 2 and a.shape[0] == 8
               else a for a in args]
    set_default_impl("auction")
    try:
        out = jax.jit(assign_3d)(*sharded)
        got = np.asarray(out)
    finally:
        set_default_impl(None)
    np.testing.assert_array_equal(got, ref)


def test_sharded_loss_matches_single_device():
    """streampetr_loss end to end: mesh-sharded auction == host-LAP."""
    from toc3d_tpu.models.streampetr_loss import streampetr_loss
    from toc3d_tpu.models.streampetr_head import StreamPETRHeadConfig

    b, q, g = 8, 32, 6
    cfg = StreamPETRHeadConfig(num_query=q, dn_max_gt=g)
    rng = np.random.RandomState(1)
    outs = {
        "all_cls_scores": jnp.asarray(
            rng.randn(2, b, q, cfg.num_classes).astype(np.float32)),
        "all_bbox_preds": jnp.asarray(
            rng.randn(2, b, q, 10).astype(np.float32)),
    }
    gt = rng.randn(b, g, 9).astype(np.float32)
    gt[..., 3:6] = np.abs(gt[..., 3:6]) + 0.5
    gt_bboxes = jnp.asarray(gt)
    gt_labels = jnp.asarray(rng.randint(0, cfg.num_classes, (b, g)))
    nv = rng.randint(0, g + 1, (b,))
    gt_valid = jnp.asarray(np.arange(g)[None] < nv[:, None])

    set_default_impl(None)
    ref = jax.jit(streampetr_loss, static_argnums=0)(
        cfg, outs, gt_bboxes, gt_labels, gt_valid)
    ref = {k: float(v) for k, v in ref.items()}

    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))
    shard = NamedSharding(mesh, P("data"))
    outs_s = {"all_cls_scores": jax.device_put(
                  outs["all_cls_scores"], NamedSharding(mesh, P(None, "data"))),
              "all_bbox_preds": jax.device_put(
                  outs["all_bbox_preds"], NamedSharding(mesh, P(None, "data")))}
    set_default_impl("auction")
    try:
        got = jax.jit(streampetr_loss, static_argnums=0)(
            cfg, outs_s, jax.device_put(gt_bboxes, shard),
            jax.device_put(gt_labels, shard),
            jax.device_put(gt_valid, shard))
        got = {k: float(v) for k, v in got.items()}
    finally:
        set_default_impl(None)
    assert ref.keys() == got.keys()
    for k in ref:
        np.testing.assert_allclose(got[k], ref[k], rtol=1e-5, atol=1e-6), k
