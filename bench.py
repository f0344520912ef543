#!/usr/bin/env python
"""Headline benchmark: ToC3D-Faster (ratios 5/4/3) @ 1600x800, 6-view
streaming inference throughput on one TPU chip.

Reference protocol (README.md:113-123, gpu_timer.py:29): warmup then timed
frames, batch 1, 6 camera views. Baseline: 1000/878.5 = 1.138 frames/s on
one A100 (figs/main_results.png, ToC3D-Faster† whole-pipeline 878.5 ms).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

# A100 whole-pipeline latency (ms) per config, BASELINE.md / paper Table 2.
A100_PIPELINE_MS = {
    "stream_petr_eva_vit_l": 317.0,
    "ToC3D_fast": 281.0,
    "ToC3D_faster": 237.2,
    "stream_petr_eva_vit_l_1600": 1309.9,
    "ToC3D_fast_1600": 1051.9,
    "ToC3D_faster_1600": 878.5,
    "stream_petr_vit_b": 115.0,
    "ToC3D_vit_b_fast": 94.0,
    "ToC3D_vit_b_faster": 85.0,
}
A100_BASELINE_FPS = 1000.0 / A100_PIPELINE_MS["ToC3D_faster_1600"]

# the paper's compression-payoff table (VERDICT r2 #2): baseline vs fast
# vs faster per backbone/resolution family
SWEEP_FAMILIES = [
    ("ViT-L 800x320", ["stream_petr_eva_vit_l", "ToC3D_fast",
                       "ToC3D_faster"]),
    ("ViT-L 1600x800", ["stream_petr_eva_vit_l_1600", "ToC3D_fast_1600",
                        "ToC3D_faster_1600"]),
    ("ViT-B 800x320", ["stream_petr_vit_b", "ToC3D_vit_b_fast",
                       "ToC3D_vit_b_faster"]),
]


def make_frame(rng, b, n, h, w, prev_exists):
    import jax.numpy as jnp
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    img2lidar = eye + rng.randn(b, n, 4, 4).astype(np.float32) * 1e-3
    return {
        "img": jnp.asarray(rng.randn(b, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "img2lidar": jnp.asarray(img2lidar),
        "timestamp": jnp.full((b,), 0.5, jnp.float32),
        "ego_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "ego_pose_inv": jnp.asarray(np.tile(np.eye(4, dtype=np.float32),
                                            (b, 1, 1))),
        "prev_exists": jnp.full((b,), prev_exists, jnp.float32),
    }


def make_train_batch(rng, b, n, h, w, g3=32, g2=32):
    """Synthetic training batch: a frame plus padded 3D/2D GT (the shapes
    build_train_sample/collate_batch would produce)."""
    import jax.numpy as jnp
    batch = make_frame(rng, b, n, h, w, 1.0)
    boxes = rng.randn(b, g3, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    b2d = np.sort(np.abs(rng.rand(b, n, g2, 2, 2)).astype(np.float32) * 300,
                  axis=-2).reshape(b, n, g2, 4)
    batch.update({
        "gt_bboxes_3d": jnp.asarray(boxes),
        "gt_labels_3d": jnp.asarray(rng.randint(0, 10, (b, g3))),
        "gt_valid_3d": jnp.asarray(np.ones((b, g3), bool)),
        "gt_bboxes_2d": jnp.asarray(b2d),
        "gt_labels_2d": jnp.asarray(rng.randint(0, 10, (b, n, g2))),
        "gt_centers_2d": jnp.asarray(
            rng.rand(b, n, g2, 2).astype(np.float32) * 300),
        "gt_valid_2d": jnp.asarray(np.ones((b, n, g2), bool)),
    })
    return batch


def bench_train(cfg, args):
    """One full train step/s (grid-mask, ToC3D backbone with selection,
    focal 2D head, DN, Hungarian via the device auction, AdamW)."""
    import jax
    import jax.numpy as jnp
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)

    b, n = args.batch, 6
    h, w = cfg.pad_shape
    qlen = getattr(args, "queue_length", 0) or 0
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tx = make_optimizer(params, total_iters=1000)
    state = init_train_state(params, tx, b, cfg)
    vscan = False
    achunk = getattr(args, "attn_chunk", 0) or None
    if getattr(args, "split_step", False):
        from toc3d_tpu.runtime.train import make_split_train_step
        assert not qlen, "--queue-length needs the plain XLA step"
        step = make_split_train_step(cfg, tx, attn_chunk=achunk,
                                      remat=not getattr(args, "no_remat",
                                                        False))
    else:
        from toc3d_tpu.runtime.train import auto_view_scan
        vs = {"auto": None, "on": True, "off": False}[
            getattr(args, "view_scan", "auto")]
        if getattr(args, "view_chunk", 0):
            vs = args.view_chunk
        if vs is None:
            vs = auto_view_scan(cfg) and achunk is None
        vscan = vs if isinstance(vs, int) and not isinstance(vs, bool) \
            else bool(vs)
        step = jax.jit(make_train_step(cfg, tx, view_scan=vs,
                                       remat=not getattr(args, "no_remat",
                                                         False),
                                       attn_chunk=achunk,
                                       multiframe=qlen > 1),
                       donate_argnums=(0,))

    rng = np.random.RandomState(0)
    if qlen > 1:
        # sliding-window multi-frame batch: T consecutive frames per sample
        # (reference queue_length regime, petr3d.py:262-308)
        frames = [make_train_batch(rng, b, n, h, w) for _ in range(qlen)]
        batch = {k: jnp.stack([f[k] for f in frames], axis=1)
                 for k in frames[0]}
    else:
        batch = make_train_batch(rng, b, n, h, w)

    # VERDICT r2 #1 protocol: >=50 steps on the FIXED batch (overfit
    # curve), per-step loss trace kept on device and fetched once at the
    # end, nonfinite_skips asserted 0 — proof that training runs and
    # learns on the real TPU.
    key = jax.random.PRNGKey(1)
    for i in range(3):                       # compile + settle
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
    np.asarray(metrics["total_loss"])
    iters = max(args.frames // 2, 50)
    trace = []
    t0 = time.perf_counter()
    for i in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k)
        trace.append((metrics["total_loss"], metrics["grad_norm"]))
        if (i + 1) % 10 == 0:
            np.asarray(metrics["total_loss"])  # bound the dispatch queue
    losses = np.asarray([np.asarray(l) for l, _ in trace], np.float64)
    gnorms = np.asarray([np.asarray(g) for _, g in trace], np.float64)
    dt = time.perf_counter() - t0
    skips = int(np.asarray(metrics.get("nonfinite_skips", 0)))
    first5, last5 = np.mean(losses[:5]), np.mean(losses[-5:])
    print(json.dumps({
        "metric": f"{args.config} train step/s (batch {b})"
                  + ("+split" if getattr(args, "split_step", False) else "")
                  + (f"+vscan{vscan}" if vscan else "")
                  + (f"+achunk{achunk}" if achunk else "")
                  + (f"+queue{qlen}" if qlen > 1 else "")
                  + ("+noremat" if getattr(args, "no_remat", False) else ""),
        "value": round(iters / dt, 4),
        "unit": "steps/s",
        "vs_baseline": None,
        "steps": iters,
        "nonfinite_skips": skips,
        "loss_finite": bool(np.isfinite(losses).all()
                            and np.isfinite(gnorms).all()),
        "loss_first5_mean": round(float(first5), 4),
        "loss_last5_mean": round(float(last5), 4),
        "loss_decreasing": bool(last5 < first5),
        "loss_trace_every5": [round(float(x), 3) for x in losses[::5]],
    }))


def run_sweep(args):
    """Bench every family (baseline/fast/faster) in subprocesses (fresh
    HBM + compile cache per config) and write PERF.md mirroring the
    paper's Table 2: absolute fps + relative speedup vs the family
    baseline, beside the reference's A100 column."""
    results = {}
    for _, names in SWEEP_FAMILIES:
        for name in names:
            cmd = [sys.executable, __file__, "--config", name,
                   "--warmup", str(args.warmup), "--frames", str(args.frames)]
            print(f"# bench {name} ...", file=sys.stderr, flush=True)
            r = subprocess.run(cmd, capture_output=True, text=True)
            line = [l for l in r.stdout.splitlines()
                    if l.startswith("{")][-1:]
            if not line:
                print(f"# {name} FAILED:\n{r.stderr[-2000:]}",
                      file=sys.stderr)
                continue
            rec = json.loads(line[0])
            results[name] = rec
            print(line[0], flush=True)

    lines = [
        "# PERF — TPU v5e (1 chip) vs A100, reference protocol",
        "",
        "Whole-pipeline streaming inference, batch 1, 6 views, synthetic",
        f"frames, {args.warmup}-frame warmup then {args.frames} timed "
        "(README.md:113-123 protocol). A100 numbers: BASELINE.md (paper "
        "Table 2). Speedup% is relative to the family baseline — the "
        "paper's headline claim for token compression.",
        "",
        "| Model | A100 ms (speedup%) | TPU fps | TPU ms (speedup%) | "
        "TPU/A100 |",
        "|---|---|---|---|---|",
    ]
    for fam, names in SWEEP_FAMILIES:
        base_name = names[0]
        base = results.get(base_name)
        base_ms = 1000.0 / base["value"] if base else None
        for name in names:
            rec = results.get(name)
            a100 = A100_PIPELINE_MS[name]
            a100_base = A100_PIPELINE_MS[base_name]
            a100_pct = "" if name == base_name else \
                f" ({100 * (a100 / a100_base - 1):+.1f}%)"
            if rec is None:
                lines.append(f"| {name} | {a100:.1f}{a100_pct} | FAILED |  |  |")
                continue
            ms = 1000.0 / rec["value"]
            pct = "" if name == base_name or not base_ms else \
                f" ({100 * (ms / base_ms - 1):+.1f}%)"
            lines.append(
                f"| {name} | {a100:.1f}{a100_pct} | {rec['value']:.2f} | "
                f"{ms:.1f}{pct} | {rec['value'] / (1000.0 / a100):.2f}x |")
    # keep hand-written analysis sections ("## ..." onwards) across reruns
    tail = ""
    if os.path.exists("PERF.md"):
        with open("PERF.md") as f:
            old = f.read()
        i = old.find("\n## ")
        if i >= 0:
            tail = "\n" + old[i + 1:]
    with open("PERF.md", "w") as f:
        f.write("\n".join(lines).rstrip() + "\n" + tail)
    print(json.dumps({"metric": "sweep", "value": len(results),
                      "unit": "configs", "vs_baseline": None}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ToC3D_faster_1600")
    # reference timing protocol: 200-sample warmup (gpu_timer.py:29,
    # README.md:113-123), then a long timed window
    ap.add_argument("--warmup", type=int, default=200)
    ap.add_argument("--frames", type=int, default=100)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--split-step", action="store_true",
                    help="with --train: use the two-program split step "
                         "(Pallas forward + XLA backward by injection)")
    ap.add_argument("--train", action="store_true",
                    help="benchmark one full train step (bf16+remat, DN + "
                         "Hungarian losses) instead of inference")
    ap.add_argument("--view-scan", choices=("auto", "on", "off"),
                    default="auto",
                    help="with --train: lax.scan the backbone over camera "
                         "views (auto: on at 1600x800 where the unscanned "
                         "backward overflows HBM)")
    ap.add_argument("--view-chunk", type=int, default=0,
                    help="with --train: scan the backbone over chunks of "
                         "this many views (overrides --view-scan; must "
                         "divide 6)")
    ap.add_argument("--attn-chunk", type=int, default=0,
                    help="with --train: bounded-memory backbone attention "
                         "— rematted lax.map over chunks of this many "
                         "windows, so per-block f32 probs never "
                         "materialize whole (makes unscanned 1600x800 fit)")
    ap.add_argument("--queue-length", type=int, default=0,
                    help="with --train: sliding-window multi-frame "
                         "training over this many consecutive frames "
                         "(reference queue_length regime; losses from the "
                         "last num_frame_losses frames)")
    ap.add_argument("--no-remat", action="store_true",
                    help="with --train: disable per-block/per-layer "
                         "jax.checkpoint (speed/memory trade; view-scan "
                         "frees the HBM that remat was buying)")
    ap.add_argument("--sweep", action="store_true",
                    help="bench every baseline/fast/faster family and "
                         "write PERF.md (compression-payoff table)")
    ap.add_argument("--int8-calib", type=int, default=0,
                    help="with --int8: statically calibrate activation "
                         "scales over this many frames (ops/int8_calib.py) "
                         "instead of per-row dynamic quantization")
    ap.add_argument("--int8", action="store_true",
                    help="experimental int8 serving path: per-channel int8 "
                         "weights + dynamic per-row activation quantization "
                         "inside the fused backbone kernels (v5e MXU int8 "
                         "rate). Accuracy bounded by tests on synthetic "
                         "weights, unvalidated vs released checkpoints.")
    args = ap.parse_args()

    if args.sweep:
        return run_sweep(args)

    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector, init_state, make_infer_fn

    cfg = get_config(args.config)
    label = args.config
    if args.int8:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, quant="int8"),
            head=dataclasses.replace(
                cfg.head, decoder=dataclasses.replace(cfg.head.decoder,
                                                      quant="int8")))
        label += "+int8"
    if args.train:
        return bench_train(cfg, args)
    h, w = cfg.pad_shape
    b, n = args.batch, 6

    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = init_state(b, cfg)

    if args.int8_calib:
        # static activation calibration (r3 #6c): capture per-block site
        # amaxes over N synthetic eval frames on the FLOAT params, attach;
        # the precast inside make_infer_fn then quantizes with fixed
        # activation scales (kernels skip the per-row dynamic amax).
        assert args.int8, "--int8-calib requires --int8"
        from toc3d_tpu.ops.int8_calib import (calibrate_act_scales,
                                              attach_act_scales)
        crng = np.random.RandomState(7)
        cal_frames = [make_frame(crng, b, n, h, w, float(i > 0))
                      for i in range(args.int8_calib)]
        params = attach_act_scales(
            params, calibrate_act_scales(params, cfg, cal_frames))
        label += f"+calib{args.int8_calib}"

    step = make_infer_fn(cfg)
    rng = np.random.RandomState(0)

    # 4 distinct image contents, cycled; prev_exists follows the nuScenes
    # scene structure (~40 frames/scene, 20 s at 2 Hz) so the first-frame
    # branch (score-MLP selector + memory refresh) is paid at the same
    # ~2.5% rate the reference's val-set protocol pays it — cycling it
    # every 4 frames (the old scheme) over-taxed it 10x.
    SCENE_LEN = 40
    variants = [[make_frame(rng, b, n, h, w, pe) for _ in range(4)]
                for pe in (0.0, 1.0)]

    def frame_at(i):
        return variants[0 if i % SCENE_LEN == 0 else 1][i % 4]

    # warmup (compile + cache); np.asarray forces real completion — the
    # axon tunnel's block_until_ready does not block reliably.
    for i in range(args.warmup):
        state, det = step(params, state, frame_at(i))
        if (i + 1) % 25 == 0:
            np.asarray(det.scores)   # bound the async dispatch queue
    np.asarray(det.scores)

    # every frame's boxes are fetched to host (real eval does), but frame
    # t-1's fetch overlaps frame t's dispatch — the streaming state
    # dependency is device-side, so this pipelining is exactly what a
    # production server does (and hides the tunnel round trip).
    t0 = time.perf_counter()
    prev = None
    for i in range(args.frames):
        state, det = step(params, state, frame_at(i))
        if prev is not None:
            np.asarray(prev.scores)
        prev = det
    np.asarray(prev.scores)
    dt = time.perf_counter() - t0

    fps = args.frames * b / dt
    ref_fps = 1000.0 / A100_PIPELINE_MS.get(args.config,
                                            A100_PIPELINE_MS["ToC3D_faster_1600"])
    print(json.dumps({
        "metric": f"{label} 6-view frames/sec/chip",
        "value": round(fps, 4),
        "unit": "frames/s",
        "vs_baseline": round(fps / ref_fps, 4),
    }))


if __name__ == "__main__":
    main()
