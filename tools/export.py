#!/usr/bin/env python
"""AOT-export the streaming detector to a StableHLO serving artifact.

The reference has no deployment path (serving = importing mmdet3d + the
plugin and running torch eager). This exports the exact two inference
programs the benchmark runs (runtime/export.py) so a server needs only
jax + numpy + the artifact directory — no model code, no config system.

Usage:
  python tools/export.py --config ToC3D_faster_1600 \\
      --checkpoint ckpt.pth-or-orbax-dir --out export/faster_1600 \\
      [--batch 1] [--views 6] [--selfcheck]
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--views", type=int, default=6)
    ap.add_argument("--cfg-options", nargs="*", default=None)
    ap.add_argument("--selfcheck", action="store_true",
                    help="reload the artifact and verify it matches "
                         "make_infer_fn bit-for-bit on 3 streaming frames")
    ap.add_argument("--int8", action="store_true",
                    help="export the int8 serving path (per-channel int8 "
                         "weights: backbone fused kernels + head decoder "
                         "linears; quantized once at export)")
    ap.add_argument("--uint8-img", action="store_true",
                    help="export the raw-uint8 frame payload program "
                         "(device-side normalization; pairs with "
                         "build_eval_frame device_normalize)")
    args = ap.parse_args()

    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.export import export_detector

    cfg = get_config(args.config)
    if args.cfg_options:
        from toc3d_tpu.configs.presets import apply_overrides
        cfg = apply_overrides(cfg, args.cfg_options)
    if args.int8:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, quant="int8"),
            head=dataclasses.replace(
                cfg.head, decoder=dataclasses.replace(cfg.head.decoder,
                                                      quant="int8")))

    if args.checkpoint and os.path.isdir(args.checkpoint):
        from toc3d_tpu.runtime.checkpoint import load_params
        params = load_params(os.path.abspath(args.checkpoint))
    elif args.checkpoint:
        from toc3d_tpu.runtime.checkpoint import (load_torch_state_dict,
                                                  convert_detector_checkpoint)
        params = convert_detector_checkpoint(
            load_torch_state_dict(args.checkpoint), cfg)
    else:
        print("WARNING: no checkpoint — exporting random weights")
        params = jax.jit(lambda k: init_detector(k, cfg))(
            jax.random.PRNGKey(0))

    import jax.numpy as jnp
    img_dtype = jnp.uint8 if args.uint8_img else jnp.float32
    t0 = time.perf_counter()
    manifest = export_detector(params, cfg, args.out, batch_size=args.batch,
                               num_views=args.views, img_dtype=img_dtype)
    sizes = {f: os.path.getsize(os.path.join(args.out, f))
             for f in sorted(os.listdir(args.out))}
    print(json.dumps({"out": args.out, "platforms": manifest["platforms"],
                      "export_s": round(time.perf_counter() - t0, 1),
                      "artifact_bytes": sizes}))

    if args.selfcheck:
        from toc3d_tpu.models.detector import init_state, make_infer_fn
        from toc3d_tpu.runtime.export import load_detector
        det = load_detector(args.out)
        ref = make_infer_fn(cfg)
        s_exp, s_ref = det.init_state(), init_state(args.batch, cfg)
        h, w = cfg.pad_shape
        rng = np.random.RandomState(0)
        worst = 0.0
        for i in range(3):
            frame = _frame(rng, args.batch, args.views, h, w,
                           0.0 if i == 0 else 1.0, uint8=args.uint8_img)
            s_exp, d_exp = det(s_exp, frame)
            s_ref, d_ref = ref(params, s_ref, frame)
            diff = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
                       for a, b in zip(d_exp[:3], d_ref[:3]))
            worst = max(worst, diff)
            print(f"# frame {i}: max|exported - make_infer_fn| = {diff:.3g}")
        assert worst == 0.0, f"self-check failed: max diff {worst}"
        print("# selfcheck OK (bit-identical)")


def _frame(rng, b, n, h, w, prev_exists, uint8=False):
    import jax.numpy as jnp
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    img = (rng.randint(0, 256, (b, n, h, w, 3)).astype(np.uint8) if uint8
           else rng.randn(b, n, h, w, 3).astype(np.float32))
    return {
        "img": jnp.asarray(img),
        "intrinsics": jnp.asarray(intr),
        "img2lidar": jnp.asarray(eye),
        "timestamp": jnp.full((b,), 0.5, jnp.float32),
        "ego_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                        (b, 1, 1))),
        "ego_pose_inv": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                            (b, 1, 1))),
        "prev_exists": jnp.full((b,), prev_exists, jnp.float32),
    }


if __name__ == "__main__":
    main()
