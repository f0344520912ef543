#!/usr/bin/env python
"""Training entry point: streaming single-frame training with the
batch-lane scene sampler.

Parity target: reference tools/train.py + dist_train.sh +
core/apis/mmdet_train.py (IterBasedRunner, AdamW backbone lr x0.1, cosine
schedule, grad clip 35, periodic checkpointing). DP over a jax 'data' mesh
replaces DDP/NCCL.

Usage:
  python tools/train.py --config ToC3D_fast \\
      --ann data/nuscenes/nuscenes2d_temporal_infos_train.pkl \\
      --data-root data/nuscenes --iters 42195 --batch-size 2 \\
      [--load-from ckpt.pth] [--work-dir work_dirs/toc3d_fast]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def run_eval(cfg, params, args, step):
    """Periodic in-training validation (reference CustomDistEvalHook,
    core/evaluation/eval_hooks.py:29-91): streaming val inference + internal
    mAP/NDS on the current params."""
    import json
    import numpy as np
    from toc3d_tpu.data.nuscenes import (NuScenesInfos, AugConfig,
                                         AUG_800x320, AUG_1600x800)
    from toc3d_tpu.data.loader import build_eval_frame
    from toc3d_tpu.models.detector import init_state, make_infer_fn
    from toc3d_tpu.runtime.eval import detections_to_nusc_annos
    from toc3d_tpu.runtime import nusc_metrics

    if cfg.pad_shape == (800, 1600):
        aug = AUG_1600x800
    elif cfg.pad_shape == (320, 800):
        aug = AUG_800x320
    else:
        aug = AugConfig(final_dim=cfg.pad_shape, H=args.src_h, W=args.src_w,
                        rand_flip=False)
    infos = NuScenesInfos(args.val_ann)
    n = min(len(infos), args.eval_limit) if args.eval_limit else len(infos)
    infer = make_infer_fn(cfg)
    state = init_state(1, cfg)
    results = {}
    prev_scene = None
    for i in range(n):
        frame, meta = build_eval_frame(infos, i, aug, args.data_root)
        frame["prev_exists"][:] = float(meta["scene_token"] == prev_scene)
        prev_scene = meta["scene_token"]
        state, det = infer(params, state, frame)
        valid = np.asarray(det.valid[0])
        results[meta["token"]] = detections_to_nusc_annos(
            np.asarray(det.bboxes[0])[valid],
            np.asarray(det.scores[0])[valid],
            np.asarray(det.labels[0])[valid], meta)
    gt = nusc_metrics.build_gt_from_infos(infos.infos[:n])
    m = nusc_metrics.evaluate(gt, results)
    print(f"[eval @ iter {step}] " + json.dumps(
        {"mAP": round(m["mAP"], 4), "NDS": round(m["NDS"], 4), "n": n}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--ann", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--work-dir", default="work_dirs/train")
    ap.add_argument("--iters", type=int, default=42195)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--seq-split-num", type=int, default=2)
    ap.add_argument("--load-from", default=None)
    ap.add_argument("--resume-from", default=None)
    ap.add_argument("--checkpoint-interval", type=int, default=1758)
    ap.add_argument("--log-interval", type=int, default=50)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cfg-options", nargs="*", default=None,
                    help="dotted-key overrides, e.g. head.num_query=900")
    ap.add_argument("--src-h", type=int, default=900)
    ap.add_argument("--src-w", type=int, default=1600)
    ap.add_argument("--val-ann", default=None,
                    help="val info pkl for periodic evaluation "
                         "(CustomDistEvalHook equivalent)")
    ap.add_argument("--eval-interval", type=int, default=0,
                    help="run val eval every N iters (0 = only at end, "
                         "reference default: once at end of training)")
    ap.add_argument("--eval-limit", type=int, default=0)
    # multi-host launch (reference multi_dist_train.sh:6-12 / slurm_train.sh)
    ap.add_argument("--split-step", action="store_true",
                    help="two-program train step (runtime/train."
                         "make_split_train_step): backbone forward via the "
                         "Pallas kernels in a separate non-differentiated "
                         "program, exact XLA backward by injection — the "
                         "faulting Pallas-in-autodiff configuration never "
                         "compiles. Single-process only.")
    ap.add_argument("--view-scan", choices=("auto", "on", "off"),
                    default="auto",
                    help="lax.scan the backbone over camera views in the "
                         "train step (auto: on at 1600x800, where the "
                         "unscanned backward overflows the chip's HBM)")
    ap.add_argument("--view-chunk", type=int, default=0,
                    help="scan the backbone over chunks of this many views "
                         "(overrides --view-scan; must divide the view "
                         "count) — fewer scan steps, larger batched-window "
                         "matmuls, still bounded temps")
    ap.add_argument("--attn-chunk", type=int, default=0,
                    help="bounded-memory backbone attention: rematted "
                         "lax.map over chunks of this many windows, so "
                         "per-block f32 attention probs never materialize "
                         "whole (makes the UNSCANNED 1600x800 step fit)")
    ap.add_argument("--no-remat", action="store_true",
                    help="disable per-block/per-decoder-layer "
                         "jax.checkpoint (speed/memory trade: +17%% at "
                         "800x320 b1; needs the shape to fit HBM)")
    ap.add_argument("--distributed", action="store_true",
                    help="call jax.distributed.initialize (auto-detect "
                         "cluster env: TPU pod / SLURM)")
    ap.add_argument("--dist-coordinator", default=None,
                    help="host:port for manual multi-process rendezvous")
    ap.add_argument("--dist-num-processes", type=int, default=None)
    ap.add_argument("--dist-process-id", type=int, default=None)
    args = ap.parse_args()

    import jax
    from toc3d_tpu.parallel.mesh import make_mesh, init_distributed
    if args.distributed or args.dist_coordinator:
        init_distributed(args.dist_coordinator, args.dist_num_processes,
                         args.dist_process_id)
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)
    from toc3d_tpu.runtime.checkpoint import (save_params, save_train_state,
                                              load_train_state)
    from toc3d_tpu.data.nuscenes import (NuScenesInfos, AugConfig,
                                         AUG_800x320, AUG_1600x800)
    from toc3d_tpu.data.loader import build_train_sample, PrefetchIterator
    from toc3d_tpu.data.sampler import (InfiniteGroupEachSampleInBatchSampler,
                                        collate_batch)

    cfg = get_config(args.config)
    if args.cfg_options:
        from toc3d_tpu.configs.presets import apply_overrides
        cfg = apply_overrides(cfg, args.cfg_options)
    if cfg.pad_shape == (800, 1600):
        aug = AUG_1600x800
    elif cfg.pad_shape == (320, 800):
        aug = AUG_800x320
    else:
        aug = AugConfig(final_dim=cfg.pad_shape, H=args.src_h, W=args.src_w,
                        resize_lim=(cfg.pad_shape[0] / args.src_h * 0.95,
                                    cfg.pad_shape[0] / args.src_h * 1.2))
    infos = NuScenesInfos(args.ann, seq_split_num=args.seq_split_num)

    nproc = jax.process_count()
    mesh = make_mesh(axis_names=("dcn", "data") if nproc > 1 else ("data",))
    n_dev = mesh.devices.size
    if n_dev > 1:
        # shard-local matching under SPMD: the host-LAP callback would
        # serialize every step onto device 0 (see assigner.set_default_impl)
        from toc3d_tpu.core.assigner import set_default_impl
        set_default_impl("auction")
    global_batch = args.batch_size * n_dev
    print(f"processes={nproc} devices={n_dev} global_batch={global_batch}")

    if args.load_from:
        from toc3d_tpu.runtime.checkpoint import (load_torch_state_dict,
                                                  convert_detector_checkpoint)
        params = convert_detector_checkpoint(
            load_torch_state_dict(args.load_from), cfg)
    else:
        params = jax.jit(lambda k: init_detector(k, cfg))(
            jax.random.PRNGKey(args.seed))

    tx = make_optimizer(params, base_lr=args.lr, total_iters=args.iters)
    state = init_train_state(params, tx, global_batch, cfg)
    if args.resume_from:
        state = load_train_state(os.path.abspath(args.resume_from), state)
        print(f"resumed from {args.resume_from} at step {int(state.step)}")
    from toc3d_tpu.parallel.mesh import dp_spec as _dp
    state = jax.device_put(state, NamedSharding(mesh, P()))
    state = state._replace(memory=jax.device_put(
        state.memory, NamedSharding(mesh, _dp(mesh))))
    achunk = args.attn_chunk or None
    if args.split_step:
        from toc3d_tpu.runtime.train import make_split_train_step
        assert n_dev == 1, "--split-step is a single-device serving of the " \
            "Pallas-forward training path; use the XLA step under meshes"
        step_fn = make_split_train_step(cfg, tx, attn_chunk=achunk,
                                        remat=not args.no_remat)
    else:
        # view_scan=None -> auto policy inside make_train_step (on at
        # 1600x800 UNLESS attn_chunk already bounds the memory)
        vs = {"auto": None, "on": True, "off": False}[args.view_scan]
        if args.view_chunk:
            vs = args.view_chunk
        step_fn = jax.jit(make_train_step(cfg, tx, view_scan=vs,
                                          attn_chunk=achunk,
                                          remat=not args.no_remat),
                          donate_argnums=(0,))

    # per-host sampling: each process draws only its own lanes (lane
    # disjointness across hosts comes from the sampler's replica striding)
    local_batch = global_batch // nproc
    sampler = InfiniteGroupEachSampleInBatchSampler(
        infos.flag, local_batch, num_replicas=nproc,
        rank=jax.process_index(), seed=args.seed)
    rng = np.random.RandomState(args.seed + jax.process_index())

    def batches():
        for idxs in sampler:
            samples = [build_train_sample(infos, i, aug, rng,
                                          max_gt_3d=cfg.head.dn_max_gt,
                                          data_root=args.data_root)
                       for i in idxs]
            yield collate_batch(samples)

    os.makedirs(args.work_dir, exist_ok=True)
    from toc3d_tpu.parallel.mesh import dp_spec
    data_sharding = NamedSharding(mesh, dp_spec(mesh))

    def put_batch(batch):
        if nproc == 1:
            return jax.device_put(batch, data_sharding)
        from jax.experimental import multihost_utils
        return jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                jnp.asarray(x), mesh, dp_spec(mesh)), batch)

    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    it = PrefetchIterator(batches(), depth=2)
    # mmcv TextLoggerHook-style metric dump (reference tools/train.py:214-225
    # writes <work_dir>/<ts>.log.json; one JSON object per log interval)
    import json as _json
    from toc3d_tpu.runtime.train import make_lr_schedule
    lr_sched = make_lr_schedule(args.lr, total_iters=args.iters)
    log_json = os.path.join(args.work_dir, "train.log.json")
    for step in range(int(state.step), args.iters):
        batch = next(it)
        batch = put_batch(batch)
        key, k = jax.random.split(key)
        state, metrics = step_fn(state, batch, k)
        if (step + 1) % args.log_interval == 0:
            metrics = {mk: float(mv) for mk, mv in metrics.items()}
            total = metrics["total_loss"]
            gn = metrics["grad_norm"]
            dt = (time.time() - t0) / args.log_interval
            t0 = time.time()
            print(f"iter {step + 1}/{args.iters} loss {total:.4f} "
                  f"grad_norm {gn:.2f} {dt:.2f}s/iter")
            if jax.process_index() == 0:
                rec = {"mode": "train", "iter": step + 1,
                       "lr": float(lr_sched(step + 1)),
                       "time": round(dt, 4)}
                rec.update({mk: round(mv, 6) for mk, mv in metrics.items()})
                with open(log_json, "a") as f:
                    f.write(_json.dumps(rec) + "\n")
        if args.val_ann and args.eval_interval and \
                (step + 1) % args.eval_interval == 0:
            run_eval(cfg, state.params, args, step + 1)
        if (step + 1) % args.checkpoint_interval == 0 and \
                jax.process_index() == 0:
            path = os.path.abspath(
                os.path.join(args.work_dir, f"iter_{step + 1}"))
            save_train_state(state, path)
            print("saved", path)

    if jax.process_index() == 0:
        path = os.path.abspath(os.path.join(args.work_dir, "final"))
        save_params(jax.device_get(state.params), path)
        print("saved", path)
    if args.val_ann:
        run_eval(cfg, state.params, args, args.iters)


if __name__ == "__main__":
    main()
