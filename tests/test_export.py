"""AOT export (runtime/export.py): the StableHLO artifact must reproduce
make_infer_fn exactly across streaming frames, with no model-building code
in the load path."""
import json
import os

import numpy as np
import jax
import pytest

from toc3d_tpu.models.detector import init_detector, init_state, make_infer_fn
from toc3d_tpu.runtime.export import (export_detector, load_detector,
                                      ExportedDetector, FRAME_KEYS)

from test_models_smoke import tiny_detector, make_frame


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    cfg = tiny_detector()
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    out = str(tmp_path_factory.mktemp("export") / "tiny")
    manifest = export_detector(params, cfg, out, batch_size=1, num_views=2)
    return cfg, params, out, manifest


def test_artifact_layout(artifact):
    cfg, params, out, manifest = artifact
    files = sorted(os.listdir(out))
    assert files == ["backbone.jaxexport", "head.jaxexport", "manifest.json",
                     "params.npz"]
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk["format"] == "toc3d_tpu.jaxexport.v1"
    assert on_disk["pad_shape"] == [64, 128]
    assert list(on_disk["frame_specs"]) == list(FRAME_KEYS)
    # serialized pytree skeleton round-trips every leaf
    assert on_disk["num_param_leaves"] == len(jax.tree_util.tree_leaves(params))


def test_streaming_parity_exact(artifact):
    """3 streaming frames (first-frame branch then steady state), both
    outputs and the threaded memory state must match make_infer_fn
    bit-for-bit — same program, same platform, same weights."""
    cfg, params, out, _ = artifact
    det = load_detector(out)
    ref = make_infer_fn(cfg)
    s_exp, s_ref = det.init_state(), init_state(1, cfg)
    for i in range(3):
        frame = make_frame(b=1, n=2, prev_exists=0.0 if i == 0 else 1.0,
                           seed=i)
        s_exp, d_exp = det(s_exp, frame)
        s_ref, d_ref = ref(params, s_ref, frame)
        for a, b in zip(d_exp, d_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(s_exp.memory, s_ref.memory):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_load_without_model_modules(artifact, tmp_path):
    """The serving path must not construct the model: loading only reads
    the artifact (deserialize + npz), never init_* or forward functions."""
    cfg, params, out, _ = artifact
    import toc3d_tpu.runtime.export as ex
    import toc3d_tpu.models.detector as md

    calls = []
    orig = md.extract_img_feat
    md.extract_img_feat = lambda *a, **k: calls.append(1) or orig(*a, **k)
    try:
        det = ExportedDetector(out)
        frame = make_frame(b=1, n=2, prev_exists=0.0, seed=7)
        state, boxes = det(det.init_state(), frame)
        np.asarray(boxes.scores)
    finally:
        md.extract_img_feat = orig
    assert calls == [], "serving path re-traced the Python model"
    assert boxes.bboxes.shape[0] == 1


def test_int8_head_uint8_img_export_selfcheck(tmp_path):
    """Production-serving export variants: head-decoder int8 (XLA int8
    dots — platform-independent, so CPU-testable; the backbone kernel int8
    path needs a TPU backend) + raw-uint8 frame payload. The artifact must
    reproduce make_infer_fn bit-for-bit on the same quantized config."""
    from dataclasses import replace
    import jax.numpy as jnp

    cfg = tiny_detector()
    cfg = replace(cfg, head=replace(
        cfg.head, decoder=replace(cfg.head.decoder, quant="int8")))
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    out = str(tmp_path / "int8")
    manifest = export_detector(params, cfg, out, batch_size=1, num_views=2,
                               img_dtype=jnp.uint8)
    assert manifest["quant"] == {"backbone": "none", "head": "int8"}
    assert manifest["frame_specs"]["img"]["dtype"] == "uint8"

    det = load_detector(out)
    ref = make_infer_fn(cfg)
    s_exp, s_ref = det.init_state(), init_state(1, cfg)
    rng = np.random.RandomState(0)
    for i in range(3):
        frame = make_frame(b=1, n=2, prev_exists=0.0 if i == 0 else 1.0,
                           seed=i)
        frame["img"] = rng.randint(0, 256, frame["img"].shape).astype(
            np.uint8)
        s_exp, d_exp = det(s_exp, frame)
        s_ref, d_ref = ref(params, s_ref, frame)
        for a, b in zip(d_exp, d_ref):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_gumbel_not_exportable(tmp_path):
    from dataclasses import replace
    cfg = tiny_detector()
    cfg = replace(cfg, backbone=replace(cfg.backbone, eval_mask="gumbel"))
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="gumbel"):
        export_detector(params, cfg, str(tmp_path / "x"), num_views=2)
