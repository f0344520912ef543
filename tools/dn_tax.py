#!/usr/bin/env python
"""Measure the static-DN train tax (VERDICT r2 #6).

The reference pads DN groups dynamically to scalar x max(num_gt) per batch
(streampetr_head.py:455-537); our static padding uses dn_max_gt, so the
decoder always runs scalar*dn_max_gt + num_query + num_propagated queries.
This times one train step at 800x320 for dn_max_gt in {32, 64, 96} and
reports steps/s, isolating what the padding costs.

Usage: python tools/dn_tax.py [--config ToC3D_faster] [--iters 20]
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
    ap.add_argument("--config", default="ToC3D_faster")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--gts", type=int, nargs="+", default=[32, 64, 96])
    args = ap.parse_args()

    import jax
    from toc3d_tpu.configs import get_config, apply_overrides
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)
    from tools.train_nan_probe import make_batch

    results = {}
    for g in args.gts:
        cfg = apply_overrides(get_config(args.config),
                              [f"head.dn_max_gt={g}"])
        params = jax.jit(lambda k: init_detector(k, cfg))(
            jax.random.PRNGKey(0))
        jax.block_until_ready(params)
        tx = make_optimizer(params, total_iters=1000)
        state = init_train_state(params, tx, 1, cfg)
        step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
        batch = make_batch(cfg, 1)
        key = jax.random.PRNGKey(1)
        for _ in range(3):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
        np.asarray(metrics["total_loss"])
        t0 = time.perf_counter()
        for _ in range(args.iters):
            key, k = jax.random.split(key)
            state, metrics = step(state, batch, k)
        np.asarray(metrics["total_loss"])
        dt = time.perf_counter() - t0
        q = (cfg.head.scalar * g + cfg.head.num_query
             + cfg.head.num_propagated)
        results[g] = {"steps_per_s": round(args.iters / dt, 3),
                      "train_queries": q}
        print(json.dumps({"dn_max_gt": g, **results[g]}), flush=True)


if __name__ == "__main__":
    main()
