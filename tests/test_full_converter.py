"""Full detector-checkpoint conversion with reference key names (ToC3D
selectors, decoder, shared branches) on tiny shapes — the converted params
must run the streaming step and reproduce the linear maps exactly."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from toc3d_tpu.configs import get_config
from toc3d_tpu.models.detector import init_state, make_infer_fn
from toc3d_tpu.runtime.checkpoint import convert_detector_checkpoint


def _lin(sd, name, din, dout, rng, bias=True):
    sd[f"{name}.weight"] = rng.randn(dout, din).astype(np.float32) * 0.05
    if bias:
        sd[f"{name}.bias"] = rng.randn(dout).astype(np.float32) * 0.05


def _ln(sd, name, d):
    sd[f"{name}.weight"] = np.ones(d, np.float32)
    sd[f"{name}.bias"] = np.zeros(d, np.float32)


def _mln(sd, name, cdim, fdim, rng):
    _lin(sd, f"{name}.reduce.0", cdim, fdim, rng)
    _lin(sd, f"{name}.gamma", fdim, fdim, rng)
    _lin(sd, f"{name}.beta", fdim, fdim, rng)


def _mha(sd, name, d, rng):
    sd[f"{name}.in_proj_weight"] = rng.randn(3 * d, d).astype(np.float32) * .05
    sd[f"{name}.in_proj_bias"] = rng.randn(3 * d).astype(np.float32) * .05
    _lin(sd, f"{name}.out_proj", d, d, rng)


def build_reference_state_dict(cfg, rng):
    b = cfg.backbone
    h = cfg.head
    d = b.embed_dim
    hid = int(d * b.mlp_ratio)
    qd = b.query_dim
    sd = {}
    # backbone
    sd["img_backbone.patch_embed.proj.weight"] = rng.randn(
        d, 3, b.patch_size, b.patch_size).astype(np.float32) * 0.05
    sd["img_backbone.patch_embed.proj.bias"] = rng.randn(d).astype(np.float32)
    npos = (b.pretrain_img_size // b.patch_size) ** 2 + 1
    sd["img_backbone.pos_embed"] = rng.randn(1, npos, d).astype(np.float32)
    for i in range(b.depth):
        pre = f"img_backbone.blocks.{i}."
        _ln(sd, pre + "norm1", d)
        _ln(sd, pre + "norm2", d)
        for n in ("q_proj", "k_proj", "v_proj"):
            _lin(sd, pre + f"attn.{n}", d, d, rng, bias=False)
        sd[pre + "attn.q_bias"] = rng.randn(d).astype(np.float32) * 0.05
        sd[pre + "attn.v_bias"] = rng.randn(d).astype(np.float32) * 0.05
        _lin(sd, pre + "attn.proj", d, d, rng)
        _lin(sd, pre + "mlp.w1", d, hid, rng)
        _lin(sd, pre + "mlp.w2", d, hid, rng)
        _lin(sd, pre + "mlp.w3", hid, d, rng)
        _ln(sd, pre + "mlp.ffn_ln", hid)
    for i in range(len(b.pruning_loc)):
        pre = f"img_backbone.score_predictor.{i}."
        _ln(sd, pre + "in_conv.0", d)
        _lin(sd, pre + "in_conv.1", d, d, rng)
        _lin(sd, pre + "out_conv.0", d, d // 2, rng)
        _lin(sd, pre + "out_conv.2", d // 2, d // 4, rng)
        _lin(sd, pre + "out_conv.4", d // 4, 2, rng)
        _lin(sd, pre + "input_proj.0", d, qd, rng)
        _lin(sd, pre + "aggregate.0", b.pruning_num_queries, 2, rng)
        _lin(sd, pre + "query_embedding.0", qd * 3 // 2, qd, rng)
        _lin(sd, pre + "query_embedding.2", qd, qd, rng)
        _mln(sd, pre + "ego_pose_pe", 180, qd, rng)
        _mln(sd, pre + "ego_pose_queries", 180, qd, rng)
        _lin(sd, pre + "time_embedding.0", qd, qd, rng)
        _ln(sd, pre + "time_embedding.1", qd)
    # neck
    oc = cfg.neck.out_channels
    sd["img_neck.lateral_convs.0.conv.weight"] = rng.randn(
        oc, d, 1, 1).astype(np.float32) * 0.05
    sd["img_neck.lateral_convs.0.conv.bias"] = rng.randn(oc).astype(np.float32)
    sd["img_neck.fpn_convs.0.conv.weight"] = rng.randn(
        oc, oc, 3, 3).astype(np.float32) * 0.05
    sd["img_neck.fpn_convs.0.conv.bias"] = rng.randn(oc).astype(np.float32)
    # head
    e = h.embed_dims
    pre = "pts_bbox_head."
    _lin(sd, pre + "position_encoder.0", h.depth_num * 3, e * 4, rng)
    _lin(sd, pre + "position_encoder.2", e * 4, e, rng)
    _lin(sd, pre + "memory_embed.0", h.in_channels, e, rng)
    _lin(sd, pre + "memory_embed.2", e, e, rng)
    _lin(sd, pre + "featurized_pe.conv_reduce", e, e, rng)
    _lin(sd, pre + "featurized_pe.conv_expand", e, e, rng)
    sd[pre + "reference_points.weight"] = rng.rand(
        h.num_query, 3).astype(np.float32)
    sd[pre + "pseudo_reference_points.weight"] = rng.rand(
        h.num_propagated, 3).astype(np.float32)
    _lin(sd, pre + "query_embedding.0", e * 3 // 2, e, rng)
    _lin(sd, pre + "query_embedding.2", e, e, rng)
    _mln(sd, pre + "spatial_alignment", 8, e, rng)
    _lin(sd, pre + "time_embedding.0", e, e, rng)
    _ln(sd, pre + "time_embedding.1", e)
    _mln(sd, pre + "ego_pose_pe", 180, e, rng)
    _mln(sd, pre + "ego_pose_memory", 180, e, rng)
    for i in range(h.decoder.num_layers):
        lpre = pre + f"transformer.decoder.layers.{i}."
        _mha(sd, lpre + "attentions.0.attn", e, rng)
        _mha(sd, lpre + "attentions.1.attn", e, rng)
        _lin(sd, lpre + "ffns.0.layers.0.0", e, h.decoder.feedforward_channels,
             rng)
        _lin(sd, lpre + "ffns.0.layers.1", h.decoder.feedforward_channels, e,
             rng)
        for j in range(3):
            _ln(sd, lpre + f"norms.{j}", e)
    _ln(sd, pre + "transformer.decoder.post_norm", e)
    # shared branches: reference stores them at every index (aliased)
    for idx in range(h.decoder.num_layers):
        bp = pre + f"cls_branches.{idx}."
        _lin(sd, bp + "0", e, e, rng)
        _ln(sd, bp + "1", e)
        _lin(sd, bp + "3", e, e, rng)
        _ln(sd, bp + "4", e)
        _lin(sd, bp + "6", e, h.num_classes, rng)
        rp = pre + f"reg_branches.{idx}."
        _lin(sd, rp + "0", e, e, rng)
        _lin(sd, rp + "2", e, e, rng)
        _lin(sd, rp + "4", e, h.code_size, rng)
    # focal head
    f = cfg.focal
    sd["img_roi_head.shared_cls.0.weight"] = rng.randn(
        f.embed_dims, f.in_channels, 3, 3).astype(np.float32) * 0.05
    sd["img_roi_head.shared_cls.0.bias"] = rng.randn(
        f.embed_dims).astype(np.float32)
    _ln(sd, "img_roi_head.shared_cls.1", f.embed_dims)
    sd["img_roi_head.shared_reg.0.weight"] = rng.randn(
        f.embed_dims, f.in_channels, 3, 3).astype(np.float32) * 0.05
    sd["img_roi_head.shared_reg.0.bias"] = rng.randn(
        f.embed_dims).astype(np.float32)
    _ln(sd, "img_roi_head.shared_reg.1", f.embed_dims)
    for n, c in (("cls", f.num_classes), ("centerness", 1), ("ltrb", 4),
                 ("center2d", 2)):
        sd[f"img_roi_head.{n}.weight"] = rng.randn(
            c, f.embed_dims, 1, 1).astype(np.float32) * 0.05
        sd[f"img_roi_head.{n}.bias"] = rng.randn(c).astype(np.float32)
    # buffers that must be skipped silently
    sd["pts_bbox_head.code_weights"] = np.ones(10, np.float32)
    sd["pts_bbox_head.pc_range"] = np.zeros(6, np.float32)
    sd["img_backbone.rope_win.freqs_cos"] = np.zeros((16, 32), np.float32)
    return sd


def test_full_checkpoint_conversion_and_run():
    cfg = get_config("tiny")
    rng = np.random.RandomState(0)
    sd = build_reference_state_dict(cfg, rng)
    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no unconverted-key warning allowed
        params = convert_detector_checkpoint(sd, cfg)

    # exact weight placement spot checks (transposition correctness)
    np.testing.assert_allclose(
        np.asarray(params["img_backbone"]["blocks"][1]["attn"]["q_proj"]["w"]),
        sd["img_backbone.blocks.1.attn.q_proj.weight"].T)
    np.testing.assert_allclose(
        np.asarray(params["pts_bbox_head"]["cls_branch"]["out"]["b"]),
        sd["pts_bbox_head.cls_branches.0.6.bias"])
    c = cfg.head.embed_dims
    np.testing.assert_allclose(
        np.asarray(params["pts_bbox_head"]["decoder"]["layers"][0]
                   ["self_attn"]["k_proj"]["w"]),
        sd["pts_bbox_head.transformer.decoder.layers.0."
           "attentions.0.attn.in_proj_weight"][c:2 * c].T)

    # converted params drive the streaming step
    import sys, os
    sys.path.insert(0, os.path.dirname(__file__))
    from test_models_smoke import make_frame
    from toc3d_tpu.models.detector import init_state
    infer = make_infer_fn(cfg)
    state = init_state(1, cfg)
    state, det = infer(params, state, make_frame(prev_exists=0.0))
    assert np.isfinite(np.asarray(det.bboxes)).all()
