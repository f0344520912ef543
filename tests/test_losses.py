"""Loss / assignment / DN numerics tests (torch-cpu oracles where useful)."""
import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from toc3d_tpu.core import losses as L
from toc3d_tpu.core import assigner as A
from toc3d_tpu.core import dn as DN
from toc3d_tpu.core.boxes import normalize_bbox, denormalize_bbox


def t2n(x):
    return x.detach().numpy()


def test_sigmoid_focal_loss_matches_torch():
    rng = np.random.RandomState(0)
    pred = rng.randn(20, 10).astype(np.float32)
    labels = rng.randint(0, 11, 20)  # 10 == background
    onehot = np.eye(11, dtype=np.float32)[labels][:, :10]
    weight = np.ones(20, np.float32)

    ours = float(L.sigmoid_focal_loss(jnp.asarray(pred), jnp.asarray(onehot),
                                      jnp.asarray(weight), avg_factor=7.0,
                                      loss_weight=2.0))
    # torch oracle (mmdet py_sigmoid_focal_loss semantics)
    p = torch.sigmoid(torch.from_numpy(pred))
    t = torch.from_numpy(onehot)
    pt = (1 - p) * t + p * (1 - t)
    fw = (0.25 * t + 0.75 * (1 - t)) * pt.pow(2)
    bce = F.binary_cross_entropy_with_logits(
        torch.from_numpy(pred), t, reduction="none")
    ref = 2.0 * float((bce * fw).sum() / 7.0)
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_l1_and_giou():
    rng = np.random.RandomState(1)
    pred = rng.randn(6, 4).astype(np.float32)
    target = rng.randn(6, 4).astype(np.float32)
    w = np.ones((6, 4), np.float32)
    ours = float(L.l1_loss(jnp.asarray(pred), jnp.asarray(target),
                           jnp.asarray(w), 3.0, loss_weight=5.0))
    ref = 5.0 * np.abs(pred - target).sum() / 3.0
    np.testing.assert_allclose(ours, ref, rtol=1e-5)

    a = np.array([[0, 0, 2, 2], [1, 1, 3, 3]], np.float32)
    b = np.array([[0, 0, 2, 2], [0, 0, 2, 2]], np.float32)
    g = np.asarray(L.giou_aligned(jnp.asarray(a), jnp.asarray(b)))
    np.testing.assert_allclose(g[0], 1.0, atol=1e-6)
    # pair 2: inter 1, union 7, enclose 9 -> 1/7 - 2/9
    np.testing.assert_allclose(g[1], 1 / 7 - 2 / 9, atol=1e-6)


def test_gaussian_focal_loss_values():
    pred = jnp.asarray([[0.9, 0.1]], jnp.float32)
    target = jnp.asarray([[1.0, 0.0]], jnp.float32)
    w = jnp.ones((1, 2))
    ours = float(L.gaussian_focal_loss(pred, target, w, avg_factor=1.0))
    ref = (-np.log(0.9 + 1e-12) * 0.1 ** 2) + (-np.log(0.9 + 1e-12) * 0.1 ** 2)
    np.testing.assert_allclose(ours, ref, rtol=1e-4)


def test_normalize_denormalize_roundtrip():
    rng = np.random.RandomState(2)
    boxes = rng.randn(5, 9).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.5
    code = normalize_bbox(jnp.asarray(boxes))
    back = np.asarray(denormalize_bbox(code))
    np.testing.assert_allclose(back[:, :6], boxes[:, :6], atol=1e-5)
    np.testing.assert_allclose(np.sin(back[:, 6]), np.sin(boxes[:, 6]),
                               atol=1e-5)
    np.testing.assert_allclose(back[:, 7:], boxes[:, 7:], atol=1e-5)


def test_hungarian_match_optimal_and_padding():
    # 3 queries, 2 valid gts of 4 slots; query0<->gt1, query2<->gt0 optimal
    cost = np.full((1, 3, 4), A.BIG_COST, np.float32)
    cost[0, :, 0] = [5.0, 9.0, 1.0]
    cost[0, :, 1] = [1.0, 8.0, 7.0]
    matched = np.asarray(A.hungarian_match(jnp.asarray(cost),
                                           jnp.asarray([2])))
    assert matched[0, 0] == 2 and matched[0, 1] == 0
    # padded gt slots are filled by the solver but masked by assign_* callers


def test_assign_3d_prefers_nearby_boxes():
    rng = np.random.RandomState(3)
    q, g = 8, 3
    gt = np.zeros((1, g, 9), np.float32)
    gt[0, :, :2] = [[0, 0], [10, 10], [-10, 5]]
    gt[0, :, 3:6] = 1.0
    gt_labels = np.array([[0, 1, 2]])
    valid = np.ones((1, g), bool)
    # queries: 3 exactly on gts (normalized code), rest far away
    code = np.asarray(normalize_bbox(jnp.asarray(gt[0])))
    preds = np.full((1, q, 10), 5.0, np.float32)
    preds[0, :3, :code.shape[-1]] = code
    cls = np.full((1, q, 10), -10.0, np.float32)
    cls[0, 0, 0] = cls[0, 1, 1] = cls[0, 2, 2] = 10.0
    matched = np.asarray(A.assign_3d(
        jnp.asarray(preds), jnp.asarray(cls), jnp.asarray(gt),
        jnp.asarray(gt_labels), jnp.asarray(valid),
        match_costs=(2.0, 2.0, 1, 1, 1, 1, 1, 1, 1, 1)))
    np.testing.assert_array_equal(matched[0], [0, 1, 2])


def test_dn_mask_structure():
    from toc3d_tpu.models.streampetr_head import StreamPETRHeadConfig
    from toc3d_tpu.models.petr_transformer import DecoderConfig
    cfg = StreamPETRHeadConfig(
        num_query=6, memory_len=8, num_propagated=2, scalar=3, dn_max_gt=2,
        decoder=DecoderConfig(embed_dims=32, num_heads=2, num_layers=1,
                              feedforward_channels=32), embed_dims=32)
    rng = np.random.RandomState(4)
    boxes = rng.randn(2, 2, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1
    dn = DN.prepare_for_dn(jax.random.PRNGKey(0), cfg, jnp.asarray(boxes),
                           jnp.asarray(rng.randint(0, 10, (2, 2))),
                           jnp.asarray(np.ones((2, 2), bool)))
    p = dn["pad_size"]
    assert p == 6
    m = np.asarray(dn["attn_mask"])
    assert m.shape == (6 + 6 + 2, 6 + 6 + 8)
    # group 0 (rows 0:2) sees its own block, not group 1 (cols 2:4)
    assert not m[0, 0] and not m[0, 1]
    assert m[0, 2] and m[0, 5]
    # matching queries (rows >= pad) cannot see DN keys
    assert m[6, 0] and m[13, 5]
    # matching queries see real keys
    assert not m[6, 6] and not m[6, 19]
    # noised refs normalized to [0, 1]
    ref = np.asarray(dn["known_ref"])
    assert (ref >= 0).all() and (ref <= 1).all()


def test_token_selection_targets():
    boxes = jnp.asarray([[[0.0, 0.0, 32.0, 16.0],
                          [0.0, 0.0, 0.0, 0.0]]])  # (1 view, 2 gts)
    valid = jnp.asarray([[True, False]])
    t = np.asarray(L.token_selection_targets(boxes, valid, 4, 8,
                                             patch_size=16))
    assert t.shape == (1, 4, 8)
    assert t[0, 0, 0] == 1.0 and t[0, 0, 1] == 1.0
    assert t[0, 1, 0] == 0.0 and t[0, 0, 2] == 0.0


def test_heatmap_targets_peak_at_center():
    from toc3d_tpu.models.focal_head_loss import gaussian_heatmap_targets
    centers = jnp.asarray([[[40.0, 24.0]]])      # -> cell (2, 1) at stride 16
    boxes = jnp.asarray([[[0.0, 0.0, 80.0, 48.0]]])
    valid = jnp.asarray([[True]])
    h = np.asarray(gaussian_heatmap_targets(centers, boxes, valid, 4, 8, 16))
    assert h.shape == (1, 4, 8)
    assert h[0, 1, 2] == h.max() and h.max() <= 1.0
