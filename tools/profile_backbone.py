#!/usr/bin/env python
"""Profile the backbone+neck program on the real TPU and print a per-op-class
time breakdown parsed straight from the jax.profiler trace (no tensorboard).

Usage: python tools/profile_backbone.py [--config ToC3D_faster_1600]
(the trace covers the whole infer step, so both the backbone and head
programs appear — read per-program totals from the jit_* lane events)
"""
import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_trace(trace_dir):
    paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert paths, f"no trace under {trace_dir}"
    with gzip.open(paths[0], "rt") as f:
        data = json.load(f)
    events = [e for e in data.get("traceEvents", [])
              if e.get("ph") == "X" and "dur" in e]
    # keep only device-lane events (TensorFlow Op / XLA Op lanes)
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in data["traceEvents"]
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    return events, pid_names


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ToC3D_faster_1600")
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--int8", action="store_true",
                    help="profile the int8 serving path (quant='int8')")
    ap.add_argument("--train", action="store_true",
                    help="profile the jitted TRAIN step (fwd+bwd+optimizer) "
                         "instead of inference")
    ap.add_argument("--split-step", action="store_true",
                    help="with --train: profile the two-program split step "
                         "(Pallas forward program + injected XLA backward)")
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           make_infer_fn)
    from bench import make_frame

    cfg = get_config(args.config)
    if args.int8:
        import dataclasses
        cfg = dataclasses.replace(
            cfg, backbone=dataclasses.replace(cfg.backbone, quant="int8"))
    h, w = cfg.pad_shape
    b, n = args.batch, 6
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    rng = np.random.RandomState(0)

    if args.train:
        from bench import make_train_batch
        from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                             make_train_step)
        tx = make_optimizer(params, total_iters=1000)
        tstate = init_train_state(params, tx, b, cfg)
        if args.split_step:
            from toc3d_tpu.runtime.train import make_split_train_step
            tstep = make_split_train_step(cfg, tx)
        else:
            tstep = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
        batch = make_train_batch(rng, b, n, h, w)
        key = jax.random.PRNGKey(1)
        for i in range(3):
            key, k = jax.random.split(key)
            tstate, metrics = tstep(tstate, batch, k)
        np.asarray(metrics["total_loss"])
        trace_dir = tempfile.mkdtemp(prefix="toc3d_prof_")
        with jax.profiler.trace(trace_dir):
            for i in range(args.iters):
                key, k = jax.random.split(key)
                tstate, metrics = tstep(tstate, batch, k)
            np.asarray(metrics["total_loss"])
    else:
        state = init_state(b, cfg)
        step = make_infer_fn(cfg)
        frames = [make_frame(rng, b, n, h, w, 0.0 if i == 0 else 1.0)
                  for i in range(3)]

        for i in range(4):
            state, det = step(params, state, frames[i % 3])
        np.asarray(det.scores)

        trace_dir = tempfile.mkdtemp(prefix="toc3d_prof_")
        with jax.profiler.trace(trace_dir):
            for i in range(args.iters):
                state, det = step(params, state, frames[i % 3])
            np.asarray(det.scores)

    events, pid_names = parse_trace(trace_dir)
    # group by event name over XLA-op lanes
    per_name = collections.Counter()
    total = 0.0
    for e in events:
        pid = pid_names.get(e.get("pid"), "")
        if "XLA Op" in pid or "TensorFlow Op" in pid or "/device:" in pid \
                or "TPU" in pid:
            per_name[e["name"]] += e["dur"]
            total += e["dur"]
    if not per_name:   # fall back: everything
        for e in events:
            per_name[e["name"]] += e["dur"]
            total += e["dur"]

    # classify
    classes = collections.Counter()
    for name, dur in per_name.items():
        lname = name.lower()
        if "fusion" in lname:
            key = "fusion"
        elif any(k in lname for k in ("convolution", "dot", "matmul", "conv")):
            key = "matmul/conv"
        elif any(k in lname for k in ("copy", "transpose", "reshape",
                                      "bitcast", "slice", "concatenate",
                                      "pad", "gather", "scatter",
                                      "dynamic-update", "sort", "reduce")):
            key = "data-movement"
        elif "custom-call" in lname or "custom_call" in lname:
            key = "custom-call"
        else:
            key = "other"
        classes[key] += dur

    print(f"\ntrace dir: {trace_dir}")
    print(f"total device-op time over {args.iters} frames: "
          f"{total/1000/args.iters:.2f} ms/frame\n")
    print("== by class (ms/frame) ==")
    for k, v in classes.most_common():
        print(f"  {k:16s} {v/1000/args.iters:9.2f}")
    print(f"\n== top {args.top} ops (ms/frame) ==")
    for name, dur in per_name.most_common(args.top):
        print(f"  {dur/1000/args.iters:9.3f}  {name[:120]}")

    # aggregate EVERY op by its name prefix (strip trailing .N / (id)
    # suffixes) so the long tail of sub-0.1 ms ops is visible instead of
    # silently truncated by --top
    import re
    by_prefix = collections.Counter()
    count = collections.Counter()
    for name, dur in per_name.items():
        if name.startswith("jit_"):        # whole-program lane events
            continue
        prefix = re.sub(r"[.\d()\-]+$", "", name)
        by_prefix[prefix] += dur
        count[prefix] += 1
    print("\n== all inner ops by prefix (ms/frame, count) ==")
    for prefix, dur in by_prefix.most_common():
        print(f"  {dur/1000/args.iters:9.3f}  x{count[prefix]:<4d} {prefix[:100]}")


if __name__ == "__main__":
    main()
