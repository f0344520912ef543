#!/usr/bin/env python
"""Closed-loop correctness proof: training must produce a detector that
DETECTS (VERDICT r3 #1).

The reference's end-to-end correctness story is a training log ending in
val metrics (training_logs/ToC3D_fast.log final mAP 0.5167 / NDS 0.6087,
eval hook core/evaluation/eval_hooks.py:54-90). Without nuScenes on this
image, the equivalent proof is: generate learnable synthetic scenes
(toc3d_tpu/data/synthetic.py — images rendered FROM the GT geometry),
train a real config to overfit them, and watch the internal mAP/NDS climb
from ~0 through the full pipeline: batch-lane sampler -> jitted train step
-> mid-run checkpoint SAVE + RESUME (fresh state object, proving the
restore path) -> streaming eval -> submission dicts -> internal evaluator.

Writes one JSON line (TRAINEVAL protocol):
  {steps, map_trajectory: [{iter, mAP, NDS}], resumed: true, ...}

Usage:
  python tools/traineval_closedloop.py --config tiny --iters 300 \
      [--lr 4e-4] [--out TRAINEVAL_r04.json]
"""
import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_eval(cfg, params, infos, aug, full=False, _cache={}):
    """Streaming eval over all samples -> internal mAP/NDS. The infer fn is
    cached across eval points (same traced programs, no re-jit).

    Reports BOTH the devkit-semantics 10-class mAP/NDS and the present-class
    restriction: the devkit averages AP over all 10 nuScenes classes
    (detection_cvpr_2019), so a synthetic set containing only K classes has
    a hard mAP ceiling of K/10 (absent classes score 0 by construction) —
    e.g. the default 3-class scenes cap mAP at 0.3, and TRAINEVAL_r04's
    0.2958 "plateau" is 98.6% of that ceiling, not a learning failure.
    mAP_present/NDS_present evaluate over the classes the GT contains and
    are the saturation-free overfit measure.

    full=True additionally returns the raw evaluate() dicts and collected
    results/gt (tools/traineval_diag.py breakdown path).
    """
    from toc3d_tpu.data.loader import build_eval_frame
    from toc3d_tpu.models.detector import init_state, make_infer_fn
    from toc3d_tpu.runtime.eval import detections_to_nusc_annos
    from toc3d_tpu.runtime import nusc_metrics

    if "infer" not in _cache:
        _cache["infer"] = make_infer_fn(cfg)
    infer = _cache["infer"]
    state = init_state(1, cfg)
    results = {}
    prev_scene = None
    for i in range(len(infos)):
        frame, meta = build_eval_frame(infos, i, aug)
        frame["prev_exists"][:] = float(meta["scene_token"] == prev_scene)
        prev_scene = meta["scene_token"]
        state, det = infer(params, state, frame)
        valid = np.asarray(det.valid[0])
        results[meta["token"]] = detections_to_nusc_annos(
            np.asarray(det.bboxes[0])[valid],
            np.asarray(det.scores[0])[valid],
            np.asarray(det.labels[0])[valid], meta)
    gt = nusc_metrics.build_gt_from_infos(infos.infos)
    m = nusc_metrics.evaluate(gt, results)
    present = tuple(sorted({b["detection_name"]
                            for boxes in gt.values() for b in boxes}))
    mp = nusc_metrics.evaluate(gt, results, class_names=present)
    out = {"mAP": round(float(m["mAP"]), 4), "NDS": round(float(m["NDS"]), 4),
           "mAP_present": round(float(mp["mAP"]), 4),
           "NDS_present": round(float(mp["NDS"]), 4)}
    if full:
        return out, {"all": m, "present": mp, "present_classes": present,
                     "results": results, "gt": gt}
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="tiny")
    ap.add_argument("--iters", type=int, default=300)
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--lr", type=float, default=4e-4)
    ap.add_argument("--warmup", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--frames-per-scene", type=int, default=8)
    ap.add_argument("--objects", type=int, default=4)
    ap.add_argument("--src-h", type=int, default=180)
    ap.add_argument("--src-w", type=int, default=320)
    ap.add_argument("--eval-points", type=int, default=3,
                    help="number of mAP evaluations AFTER the initial one")
    ap.add_argument("--out", default=None, help="write the JSON line here")
    ap.add_argument("--data-dir", default=None,
                    help="reuse/keep the synthetic dataset here")
    ap.add_argument("--cfg-options", nargs="*", default=None)
    args = ap.parse_args()

    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.configs.presets import apply_overrides
    from toc3d_tpu.data.synthetic import make_learnable_dataset
    from toc3d_tpu.data.nuscenes import NuScenesInfos, AugConfig
    from toc3d_tpu.data.loader import build_train_sample
    from toc3d_tpu.data.sampler import (
        InfiniteGroupEachSampleInBatchSampler, collate_batch)
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)
    from toc3d_tpu.runtime.checkpoint import save_train_state, load_train_state

    cfg = get_config(args.config)
    if args.cfg_options:
        cfg = apply_overrides(cfg, args.cfg_options)

    data_dir = args.data_dir or tempfile.mkdtemp(prefix="traineval_")
    pkl = os.path.join(data_dir, "infos.pkl")
    if not os.path.exists(pkl):
        pkl = make_learnable_dataset(
            data_dir, n_scenes=args.scenes,
            frames_per_scene=args.frames_per_scene,
            n_cams=2, src_h=args.src_h, src_w=args.src_w,
            n_objects=args.objects, seed=args.seed)
    # DETERMINISTIC aug: train resize pinned to the eval scale, zero crop
    # jitter — the closed loop proves image-conditioned overfit, and per-step
    # aug jitter only slows the tiny-scale grounding it is probing
    fh, fw = cfg.pad_shape
    s = max(fh / args.src_h, fw / args.src_w)
    aug = AugConfig(final_dim=cfg.pad_shape, H=args.src_h, W=args.src_w,
                    rand_flip=False, resize_lim=(s, s))
    infos_train = NuScenesInfos(pkl, seq_split_num=1)
    infos_eval = NuScenesInfos(pkl)

    params = jax.jit(lambda k: init_detector(k, cfg))(
        jax.random.PRNGKey(args.seed))
    tx = make_optimizer(params, base_lr=args.lr, total_iters=args.iters,
                        warmup_iters=args.warmup)
    state = init_train_state(params, tx, args.batch_size, cfg)
    step_fn = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))

    sampler = InfiniteGroupEachSampleInBatchSampler(
        infos_train.flag, args.batch_size, seed=args.seed)
    rng = np.random.RandomState(args.seed)
    sample_it = iter(sampler)

    def next_batch():
        idxs = next(sample_it)
        return collate_batch([
            build_train_sample(infos_train, i, aug, rng,
                               max_gt_3d=cfg.head.dn_max_gt) for i in idxs])

    traj = [dict(iter=0, **run_eval(cfg, params, infos_eval, aug))]
    print(f"[traineval] iter 0: {traj[-1]}", flush=True)

    key = jax.random.PRNGKey(args.seed)
    eval_iters = sorted({args.iters * (i + 1) // args.eval_points
                         for i in range(args.eval_points)})
    resume_at = args.iters // 2
    ckpt_dir = os.path.abspath(os.path.join(data_dir, "ckpt"))
    resumed = False
    losses = []
    t0 = time.time()
    step = 0
    while step < args.iters:
        batch = next_batch()
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        step += 1
        losses.append(float(metrics["total_loss"]))
        if step == resume_at and not resumed:
            # prove checkpoint-resume mid-run: save, rebuild a FRESH state
            # pytree (fresh params init — nothing may leak through except
            # the restored file), restore into it, continue training
            save_train_state(state, ckpt_dir)
            fresh_params = jax.jit(lambda kk: init_detector(kk, cfg))(
                jax.random.PRNGKey(args.seed + 123))
            fresh = init_train_state(fresh_params, tx, args.batch_size, cfg)
            state = load_train_state(ckpt_dir, fresh)
            assert int(state.step) == resume_at, int(state.step)
            resumed = True
            print(f"[traineval] checkpoint resume at iter {step} ok",
                  flush=True)
        if step % 25 == 0:
            print(f"[traineval] iter {step} loss {losses[-1]:.3f} "
                  f"({(time.time() - t0) / step:.2f}s/it)", flush=True)
        if step in eval_iters:
            traj.append(dict(iter=step,
                             **run_eval(cfg, state.params, infos_eval, aug)))
            print(f"[traineval] iter {step}: {traj[-1]}", flush=True)

    save_train_state(state, ckpt_dir)      # final state, for post-hoc diag
    steps_per_sec = args.iters / (time.time() - t0)  # includes eval pauses
    out = {
        "metric": f"{args.config} closed-loop train->eval (synthetic scenes)",
        "value": traj[-1]["mAP"],
        "unit": "mAP",
        "vs_baseline": None,
        "steps": args.iters,
        "resumed": resumed,
        "map_trajectory": traj,
        "loss_first5_mean": round(float(np.mean(losses[:5])), 3),
        "loss_last5_mean": round(float(np.mean(losses[-5:])), 3),
        "samples": len(infos_eval),
        "lr": args.lr,
        "wall_s": round(time.time() - t0, 1),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
