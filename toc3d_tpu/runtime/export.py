"""AOT export / serving: serialize the streaming inference programs to
StableHLO artifacts with `jax.export`, loadable without the model code.

The reference has no deployment story at all — serving means a Python
process importing mmdet3d + the plugin and running torch eager
(reference tools/test.py:1-260). Here the two jitted inference programs
(backbone+neck, head+decode — the same two-program split `make_infer_fn`
uses, models/detector.py:218) are exported to StableHLO, which carries
jax.export's forward-compatibility guarantee, and the weights ship as a
plain .npz beside them. A server process needs only `load_detector` (jax
+ numpy; none of the model-building modules are touched) and gets the
exact program the benchmark ran, byte-identical numerics included.

Artifact layout (one directory):
  backbone.jaxexport   -- StableHLO, (params, img, memory, frame) -> feats
  head.jaxexport       -- StableHLO, (params, state, feats, frame)
                          -> (state', DecodedBoxes)
  params.npz           -- precast weights (leaf_{i}) + initial MemoryBank
                          (mem_{field}) arrays
  manifest.json        -- pytree skeleton for params + shapes/dtypes of
                          the frame dict, batch size, platforms, versions
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

from ..core.coder import DecodedBoxes
from ..models.detector import (DetectorConfig, DetectorState,
                               _precast_backbone_params, extract_img_feat,
                               head_step, init_state)
from ..models.streampetr_head import MemoryBank

_REGISTERED = False

# Frame keys the exported programs consume, in the order load_detector
# rebuilds the dict. (B, N) batch/view leading dims; see
# models/detector.infer_step docstring for semantics.
FRAME_KEYS = ("img", "intrinsics", "img2lidar", "timestamp", "ego_pose",
              "ego_pose_inv", "prev_exists")


def _register():
    """Idempotently register the NamedTuple pytrees jax.export must
    serialize across the in/out trees of the two programs."""
    global _REGISTERED
    if _REGISTERED:
        return
    for cls in (MemoryBank, DetectorState, DecodedBoxes):
        jax_export.register_namedtuple_serialization(
            cls, serialized_name=f"toc3d_tpu.{cls.__name__}")
    _REGISTERED = True


# ---------------------------------------------------------------------------
# pytree <-> npz skeleton codec (dict / list / tuple containers, array leaves)
# ---------------------------------------------------------------------------

def _encode_tree(tree, leaves: list):
    if isinstance(tree, dict):
        return {"t": "dict",
                "v": {k: _encode_tree(v, leaves) for k, v in tree.items()}}
    if isinstance(tree, (list, tuple)):
        return {"t": "list" if isinstance(tree, list) else "tuple",
                "v": [_encode_tree(v, leaves) for v in tree]}
    leaves.append(np.asarray(tree))
    return {"t": "leaf", "i": len(leaves) - 1}


def _decode_tree(skel, leaves):
    t = skel["t"]
    if t == "dict":
        return {k: _decode_tree(v, leaves) for k, v in skel["v"].items()}
    if t in ("list", "tuple"):
        seq = [_decode_tree(v, leaves) for v in skel["v"]]
        return seq if t == "list" else tuple(seq)
    return leaves[skel["i"]]


def _spec(tree):
    return jax.tree_util.tree_map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), tree)


# ---------------------------------------------------------------------------
# export
# ---------------------------------------------------------------------------

def frame_specs(cfg: DetectorConfig, batch_size: int = 1,
                num_views: int = 6,
                img_dtype=jnp.float32) -> Dict[str, jax.ShapeDtypeStruct]:
    """img_dtype=jnp.uint8 exports the production-serving payload program:
    raw uint8 BGR frames (data/loader.build_eval_frame device_normalize),
    normalized inside the backbone program (detector.extract_img_feat) —
    4x smaller host->device transfer."""
    h, w = cfg.pad_shape
    b, n = batch_size, num_views
    f32 = jnp.float32
    return {
        "img": jax.ShapeDtypeStruct((b, n, h, w, 3), jnp.dtype(img_dtype)),
        "intrinsics": jax.ShapeDtypeStruct((b, n, 4, 4), f32),
        "img2lidar": jax.ShapeDtypeStruct((b, n, 4, 4), f32),
        "timestamp": jax.ShapeDtypeStruct((b,), f32),
        "ego_pose": jax.ShapeDtypeStruct((b, 4, 4), f32),
        "ego_pose_inv": jax.ShapeDtypeStruct((b, 4, 4), f32),
        "prev_exists": jax.ShapeDtypeStruct((b,), f32),
    }


def export_detector(params, cfg: DetectorConfig, out_dir: str,
                    batch_size: int = 1, num_views: int = 6,
                    platforms=None, img_dtype=jnp.float32) -> Dict[str, Any]:
    """Export the streaming detector to `out_dir`; returns the manifest.

    params: raw (f32) detector params — the backbone precast to the
    compute dtype happens here, once, so the artifact's weights are
    exactly what `make_infer_fn`'s per-params cache would feed the
    programs. Stochastic-eval configs (eval_mask='gumbel') thread a
    per-frame PRNG through the backbone and are not exportable as a
    fixed-signature program; export the default deterministic eval.
    """
    _register()
    if getattr(cfg.backbone, "eval_mask", "softmax") == "gumbel":
        raise ValueError("eval_mask='gumbel' (stochastic eval) is not "
                         "exportable; use the deterministic default")

    p = jax.jit(lambda q: _precast_backbone_params(q, cfg))(params)
    jax.block_until_ready(p)
    state0 = init_state(batch_size, cfg)
    fspec = frame_specs(cfg, batch_size, num_views, img_dtype)
    pspec, sspec = _spec(p), _spec(state0)

    # Mosaic TPU kernels lower to the "tpu_custom_call" target, which
    # jax.export flags as non-forward-compatible; the artifact is then
    # pinned to the exporting jax/libtpu generation (documented in the
    # manifest) rather than refused outright.
    checks = [jax_export.DisabledSafetyCheck.custom_call("tpu_custom_call"),
              jax_export.DisabledSafetyCheck.custom_call("Sharding")]
    kw = dict(disabled_checks=checks)
    if platforms is not None:
        kw["platforms"] = tuple(platforms)

    bb = jax.jit(lambda q, img, mem, f: extract_img_feat(
        q, cfg, img, mem, f)[0])
    exp_bb = jax_export.export(bb, **kw)(pspec, fspec["img"],
                                         sspec.memory, fspec)
    feats_spec = jax.ShapeDtypeStruct(exp_bb.out_avals[0].shape,
                                      exp_bb.out_avals[0].dtype)
    hd = jax.jit(lambda q, s, feats, f: head_step(q, cfg, s, feats, f))
    exp_hd = jax_export.export(hd, **kw)(pspec, sspec, feats_spec, fspec)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "backbone.jaxexport"), "wb") as f:
        f.write(exp_bb.serialize())
    with open(os.path.join(out_dir, "head.jaxexport"), "wb") as f:
        f.write(exp_hd.serialize())

    leaves: list = []
    skel = _encode_tree(jax.tree_util.tree_map(np.asarray, p), leaves)
    arrays = {f"leaf_{i}": a for i, a in enumerate(leaves)}
    for name, arr in state0.memory._asdict().items():
        arrays[f"mem_{name}"] = np.asarray(arr)
    np.savez(os.path.join(out_dir, "params.npz"), **arrays)

    manifest = {
        "format": "toc3d_tpu.jaxexport.v1",
        "batch_size": batch_size,
        "num_views": num_views,
        "pad_shape": list(cfg.pad_shape),
        "compute_dtype": cfg.compute_dtype,
        "quant": {"backbone": getattr(cfg.backbone, "quant", "none"),
                  "head": getattr(cfg.head.decoder, "quant", "none")},
        "frame_keys": list(FRAME_KEYS),
        "frame_specs": {k: {"shape": list(v.shape), "dtype": str(v.dtype)}
                        for k, v in fspec.items()},
        "feats": {"shape": list(feats_spec.shape),
                  "dtype": str(feats_spec.dtype)},
        "platforms": list(exp_bb.platforms),
        "jax_version": jax.__version__,
        "calling_convention_version": exp_bb.calling_convention_version,
        "params_skeleton": skel,
        "num_param_leaves": len(leaves),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


# ---------------------------------------------------------------------------
# load / serve
# ---------------------------------------------------------------------------

class ExportedDetector:
    """A served detector: exactly `make_infer_fn` semantics, rebuilt from
    the on-disk artifact with no model code.

        det = ExportedDetector(path)
        state = det.init_state()
        state, boxes = det(state, frame)     # frame: dict of np/jnp arrays
    """

    def __init__(self, path: str):
        _register()
        with open(os.path.join(path, "manifest.json")) as f:
            self.manifest = json.load(f)
        with open(os.path.join(path, "backbone.jaxexport"), "rb") as f:
            self._bb = jax_export.deserialize(bytearray(f.read()))
        with open(os.path.join(path, "head.jaxexport"), "rb") as f:
            self._hd = jax_export.deserialize(bytearray(f.read()))
        npz = np.load(os.path.join(path, "params.npz"))
        leaves = [jnp.asarray(npz[f"leaf_{i}"])
                  for i in range(self.manifest["num_param_leaves"])]
        self.params = _decode_tree(self.manifest["params_skeleton"], leaves)
        self._mem0 = MemoryBank(**{k: jnp.asarray(npz[f"mem_{k}"])
                                   for k in MemoryBank._fields})
        self._bb_call = jax.jit(self._bb.call)
        self._hd_call = jax.jit(self._hd.call)

    def init_state(self) -> DetectorState:
        return DetectorState(memory=self._mem0)

    def __call__(self, state: DetectorState, frame) -> Tuple[DetectorState,
                                                             DecodedBoxes]:
        frame = {k: jnp.asarray(frame[k]) for k in self.manifest["frame_keys"]}
        feats = self._bb_call(self.params, frame["img"], state.memory, frame)
        return self._hd_call(self.params, state, feats, frame)


def load_detector(path: str) -> ExportedDetector:
    return ExportedDetector(path)
