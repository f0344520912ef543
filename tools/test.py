#!/usr/bin/env python
"""Streaming evaluation entry point.

Parity target: reference tools/test.py + dist_test.sh — scene-ordered val
inference, results_nusc.json, mAP/NDS. Single-controller JAX replaces the
DDP/pickle-gather machinery (SURVEY.md §5).

Usage:
  python tools/test.py --config ToC3D_faster_1600 \\
      --ann data/nuscenes/nuscenes2d_temporal_infos_val.pkl \\
      --data-root data/nuscenes --checkpoint ckpt.pth-or-orbax-dir \\
      --work-dir work_dirs/eval [--speed-test]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--work-dir", default="work_dirs/eval")
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--speed-test", action="store_true",
                    help="activate the warmup-200 timing protocol "
                         "(test_time_print equivalent)")
    ap.add_argument("--fast-decode", action="store_true",
                    help="production serving pipeline: reduced-scale JPEG "
                         "decode + uint8 device-side normalization "
                         "(~3x less host decode, 4x smaller upload; pixel "
                         "values differ slightly from the parity-exact "
                         "bicubic path)")
    ap.add_argument("--token-vis", type=int, default=0, metavar="N",
                    help="write kept/dropped token PNGs for the first N "
                         "samples (token_vis_ToC3D config equivalent)")
    ap.add_argument("--vis-out", default="token_vis")
    ap.add_argument("--src-h", type=int, default=900)
    ap.add_argument("--src-w", type=int, default=1600)
    ap.add_argument("--cfg-options", nargs="*", default=None,
                    help="dotted-key overrides, e.g. head.num_query=900")
    ap.add_argument("--ref-parity", action="store_true",
                    help="reproduce the reference's eval conventions exactly:"
                         " gumbel-STOCHASTIC token mask (the reference keeps"
                         " F.gumbel_softmax noisy at eval,"
                         " toc3d_utils.py:146-147) seeded by --ref-parity-seed")
    ap.add_argument("--ref-parity-seed", type=int, default=0)
    ap.add_argument("--distributed", action="store_true",
                    help="multi-process eval: jax.distributed.initialize, "
                         "scenes sharded per host, results gathered "
                         "(reference core/apis/test.py:116-160)")
    ap.add_argument("--dist-coordinator", default=None)
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args()

    if args.distributed or args.dist_coordinator:
        from toc3d_tpu.parallel.mesh import init_distributed
        init_distributed(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)
    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           make_infer_fn)
    from toc3d_tpu.data.nuscenes import (NuScenesInfos, AugConfig,
                                         AUG_800x320, AUG_1600x800)
    from toc3d_tpu.data.loader import build_eval_frame, PrefetchIterator
    from toc3d_tpu.runtime.eval import (streaming_eval, write_submission,
                                        detections_to_nusc_annos)
    from toc3d_tpu.runtime.timer import GLOBAL_TIMER

    cfg = get_config(args.config)
    if args.cfg_options:
        from toc3d_tpu.configs.presets import apply_overrides
        cfg = apply_overrides(cfg, args.cfg_options)
    if args.ref_parity and cfg.is_toc3d:
        from dataclasses import replace
        cfg = replace(cfg, backbone=replace(cfg.backbone,
                                            eval_mask="gumbel"))
    if cfg.pad_shape == (800, 1600):
        aug = AUG_1600x800
    elif cfg.pad_shape == (320, 800):
        aug = AUG_800x320
    else:
        # non-standard resolution (e.g. tiny test configs): resize source
        # frames (--src-h/--src-w) straight to the padded model input
        aug = AugConfig(final_dim=cfg.pad_shape, H=args.src_h, W=args.src_w,
                        rand_flip=False)
    infos = NuScenesInfos(args.ann)
    n = min(len(infos), args.limit) if args.limit else len(infos)

    if args.checkpoint and os.path.isdir(args.checkpoint):
        from toc3d_tpu.runtime.checkpoint import load_params
        params = load_params(os.path.abspath(args.checkpoint))
    elif args.checkpoint:
        from toc3d_tpu.runtime.checkpoint import (load_torch_state_dict,
                                                  convert_detector_checkpoint)
        params = convert_detector_checkpoint(
            load_torch_state_dict(args.checkpoint), cfg)
    else:
        print("WARNING: no checkpoint — evaluating random weights")
        params = jax.jit(lambda k: init_detector(k, cfg))(
            jax.random.PRNGKey(0))

    infer = make_infer_fn(cfg, mask_seed=args.ref_parity_seed)
    GLOBAL_TIMER.set_activate(args.speed_test)

    # multi-process: contiguous scene chunks per host (streaming needs whole
    # scenes; contiguity keeps gather_results_multihost order-preserving)
    sample_range = range(n)
    if jax.process_count() > 1:
        scene_of = [infos.infos[i]["scene_token"] for i in range(n)]
        bounds = [0] + [i for i in range(1, n)
                        if scene_of[i] != scene_of[i - 1]] + [n]
        starts = bounds[:-1]
        nproc, pid = jax.process_count(), jax.process_index()
        per = -(-len(starts) // nproc)
        lo = starts[pid * per] if pid * per < len(starts) else n
        hi = (starts[(pid + 1) * per]
              if (pid + 1) * per < len(starts) else n)
        sample_range = range(lo, hi)
        print(f"process {pid}/{nproc}: samples [{lo}, {hi})")

    def frames():
        for i in sample_range:
            yield build_eval_frame(infos, i, aug, args.data_root,
                                   fast_decode=args.fast_decode,
                                   device_normalize=args.fast_decode)

    results = {}
    state = init_state(1, cfg)
    prev_scene = None
    import time

    def collect(det, meta):
        valid = np.asarray(det.valid[0])
        results[meta["token"]] = detections_to_nusc_annos(
            np.asarray(det.bboxes[0])[valid],
            np.asarray(det.scores[0])[valid],
            np.asarray(det.labels[0])[valid], meta)

    t_total, timed = 0.0, 0
    pending = None   # fetch frame t-1 after dispatching frame t (pipelined)
    for i, (frame, meta) in enumerate(PrefetchIterator(frames())):
        pe = 1.0 if meta["scene_token"] == prev_scene else 0.0
        prev_scene = meta["scene_token"]
        frame["prev_exists"][:] = pe
        t0 = time.perf_counter()
        if i < args.token_vis and cfg.is_toc3d:
            import jax as _jax
            from toc3d_tpu.models.detector import infer_step_with_aux
            from toc3d_tpu.runtime.token_vis import token_selection_vis
            state, det, aux = _jax.jit(
                lambda p, s, f: infer_step_with_aux(p, cfg, s, f))(
                params, state, frame)
            token_selection_vis(
                np.asarray(frame["img"][0]),
                [np.asarray(m) for m in aux["token_masks"]],
                os.path.join(args.vis_out, str(i)),
                patch_size=cfg.backbone.patch_size)
        else:
            state, det = infer(params, state, frame)
        if pending is not None:
            collect(*pending)
        pending = (det, meta)
        dt = time.perf_counter() - t0
        if i >= 200:                       # reference warmup protocol
            t_total += dt
            timed += 1
        if (i + 1) % 500 == 0:
            print(f"{i + 1}/{n} samples")
    if pending is not None:
        collect(*pending)

    if jax.process_count() > 1:
        from toc3d_tpu.runtime.eval import gather_results_multihost
        results = gather_results_multihost(results)
        if jax.process_index() != 0:
            return

    path = write_submission(results, args.work_dir)
    print("wrote", path)
    if timed:
        print(f"speed: {timed / t_total:.3f} frames/s "
              f"({1000 * t_total / timed:.1f} ms/frame, warmup 200)")

    try:
        from toc3d_tpu.runtime.eval import evaluate_submission
        metrics = evaluate_submission(path, args.data_root or ".",
                                      version=infos.version)
        print(json.dumps(metrics))
    except ImportError:
        from toc3d_tpu.runtime import nusc_metrics
        gt = nusc_metrics.build_gt_from_infos(infos.infos[:n])
        metrics = nusc_metrics.evaluate(gt, results)
        print(json.dumps({"mAP": metrics["mAP"], "NDS": metrics["NDS"],
                          "evaluator": "internal"}))


if __name__ == "__main__":
    main()
