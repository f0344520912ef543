#!/usr/bin/env python
"""Component-level speed benchmark with the reference timing protocol.

Parity target: reference tools/benchmark.py (whole-model FPS, warmup 5) and
the speed-test configs' GLOBAL_TIMER events (backbone / img_neck /
3D Transformer, warmup 200 — README.md:113-123). Random weights; random
frames (speed is shape-dependent only).

Usage: python tools/benchmark.py --config ToC3D_ratio543_1600 [--frames 50]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ToC3D_faster_1600")
    ap.add_argument("--warmup", type=int, default=10)
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--cfg-options", nargs="*", default=None,
                    help="dotted-key overrides, e.g. head.num_query=900")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           extract_img_feat, head_step)

    cfg = get_config(args.config)
    if args.cfg_options:
        from toc3d_tpu.configs.presets import apply_overrides
        cfg = apply_overrides(cfg, args.cfg_options)
    h, w = cfg.pad_shape
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = init_state(1, cfg)

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
    from bench import make_frame
    rng = np.random.RandomState(0)
    frame = make_frame(rng, 1, 6, h, w, 1.0)

    ex = jax.jit(lambda p, img, mem, f: extract_img_feat(p, cfg, img, mem,
                                                         f)[0])
    hd = jax.jit(lambda p, s, feats, f: head_step(p, cfg, s, feats, f))

    def fetch(x):
        return np.asarray(jax.tree_util.tree_leaves(x)[0].ravel()[0])

    # compile
    feats = ex(params, frame["img"], state.memory, frame)
    state, det = hd(params, state, feats, frame)
    fetch(det.scores)

    t_backbone, t_head = [], []
    for i in range(args.warmup + args.frames):
        t0 = time.perf_counter()
        feats = ex(params, frame["img"], state.memory, frame)
        fetch(feats)
        t1 = time.perf_counter()
        state, det = hd(params, state, feats, frame)
        fetch(det.scores)
        t2 = time.perf_counter()
        if i >= args.warmup:
            t_backbone.append(t1 - t0)
            t_head.append(t2 - t1)

    bb = 1000 * np.asarray(t_backbone)
    hh = 1000 * np.asarray(t_head)
    tot = bb + hh
    print(f"config: {args.config}  input {w}x{h}  frames {args.frames}")
    print(f"backbone+neck: mean {bb.mean():.1f} ms  min {bb.min():.1f}  "
          f"max {bb.max():.1f}")
    print(f"head+decode:   mean {hh.mean():.1f} ms  min {hh.min():.1f}  "
          f"max {hh.max():.1f}")
    print(f"total:         mean {tot.mean():.1f} ms  -> "
          f"{1000.0 / tot.mean():.3f} frames/s")


if __name__ == "__main__":
    main()
