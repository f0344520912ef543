#!/usr/bin/env python
"""Probe the axon train-metrics NaN-readback bug (CLAUDE.md known-gaps #2).

Round-2 bisect facts: pure-forward outputs finite; identical
value_and_grad+optimizer program with grads RETURNED is 243/243 finite;
the make_train_step structure (TrainState + metrics dict returned) reads
NaN loss/grad_norm; WHICH scalar NaNs flips with the jit output set.

This probe distinguishes "values are really NaN in the returned buffers"
from "host readback through the axon tunnel is corrupted" by re-checking
the returned metric arrays inside a SECOND jitted program (device-side
isfinite), and tests candidate output-set restructurings:

  variants:
    base     — current make_train_step, donated state     (repro control)
    nodonate — same program, no donation
    packed   — metrics stacked into one (K,) vector, returned beside state
    vector128— metrics broadcast to (128,) lanes (pad scalar outputs)

Usage: python tools/train_nan_probe.py --config ToC3D_faster --steps 3
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def make_batch(cfg, b):
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    n, g3, g2 = 6, 32, 32
    h, w = cfg.pad_shape
    eye = np.tile(np.eye(4, dtype=np.float32), (b, n, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    boxes = rng.randn(b, g3, 9).astype(np.float32)
    boxes[..., 3:6] = np.abs(boxes[..., 3:6]) + 1.0
    b2d = np.sort(np.abs(rng.rand(b, n, g2, 2, 2)).astype(np.float32) * 300,
                  axis=-2).reshape(b, n, g2, 4)
    return {
        "img": jnp.asarray(rng.randn(b, n, h, w, 3).astype(np.float32)),
        "intrinsics": jnp.asarray(intr),
        "img2lidar": jnp.asarray(eye + rng.randn(b, n, 4, 4).astype(np.float32) * 1e-3),
        "timestamp": jnp.full((b,), 0.5, jnp.float32),
        "ego_pose": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "ego_pose_inv": jnp.asarray(np.tile(np.eye(4, dtype=np.float32), (b, 1, 1))),
        "prev_exists": jnp.full((b,), 1.0, jnp.float32),
        "gt_bboxes_3d": jnp.asarray(boxes),
        "gt_labels_3d": jnp.asarray(rng.randint(0, 10, (b, g3))),
        "gt_valid_3d": jnp.asarray(np.ones((b, g3), bool)),
        "gt_bboxes_2d": jnp.asarray(b2d),
        "gt_labels_2d": jnp.asarray(rng.randint(0, 10, (b, n, g2))),
        "gt_centers_2d": jnp.asarray(rng.rand(b, n, g2, 2).astype(np.float32) * 300),
        "gt_valid_2d": jnp.asarray(np.ones((b, n, g2), bool)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ToC3D_faster")
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--variant", default="base",
                    choices=["base", "nodonate", "packed", "stateonly"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)

    cfg = get_config(args.config)
    print(f"backend={jax.default_backend()} variant={args.variant}", flush=True)
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tx = make_optimizer(params, total_iters=1000)
    state = init_train_state(params, tx, args.batch, cfg)
    batch = make_batch(cfg, args.batch)

    base_step = make_train_step(cfg, tx)

    if args.variant in ("base", "nodonate"):
        donate = (0,) if args.variant == "base" else ()
        step = jax.jit(base_step, donate_argnums=donate)
    elif args.variant == "packed":
        def packed_step(st, b, r):
            st, metrics = base_step(st, b, r)
            vec = jnp.stack([jnp.asarray(metrics[k2], jnp.float32)
                             for k2 in sorted(metrics)])
            return st, vec
        step = jax.jit(packed_step, donate_argnums=(0,))
    else:  # stateonly: metrics dropped from the output set entirely
        jit_state = jax.jit(lambda st, b, r: base_step(st, b, r)[0],
                            donate_argnums=(0,))
        step = jit_state

    # second program: device-side finite check of whatever came back
    @jax.jit
    def finite_check(tree):
        leaves = jax.tree_util.tree_leaves(tree)
        return jnp.stack([jnp.all(jnp.isfinite(
            jnp.asarray(l, jnp.float32))) for l in leaves])

    # third program: identity relaunder (copy through a fresh executable)
    @jax.jit
    def relaunder(tree):
        return jax.tree_util.tree_map(lambda x: x + 0, tree)

    key = jax.random.PRNGKey(1)
    for i in range(args.steps):
        key, k = jax.random.split(key)
        t0 = time.perf_counter()
        out = step(state, batch, k)
        if args.variant == "stateonly":
            state, metrics = out, None
        elif args.variant == "packed":
            state, vec = out
            metrics = {"packed": vec}
        else:
            state, metrics = out

        report = {"step": i, "t": round(time.perf_counter() - t0, 1)}
        if metrics is not None:
            # device-side verdicts BEFORE any host fetch
            dev_finite = np.asarray(finite_check(metrics))
            relaund = relaunder(metrics)
            host_vals = {k2: float(np.asarray(v).ravel()[0])
                         for k2, v in metrics.items()} if args.variant != "packed" \
                else {"packed": np.asarray(vec).tolist()}
            relaund_vals = {k2: float(np.asarray(v).ravel()[0])
                            for k2, v in relaund.items()} if args.variant != "packed" \
                else {"packed": np.asarray(relaund["packed"]).tolist()}
            report["metrics_device_finite"] = dev_finite.tolist()
            report["metrics_host"] = host_vals
            report["metrics_relaundered"] = relaund_vals
        # params finiteness (in a separate program, known-good readback path)
        pf = np.asarray(finite_check(state.params))
        report["params_all_finite"] = bool(pf.all())
        mf = np.asarray(finite_check(state.memory))
        report["memory_all_finite"] = bool(mf.all())
        print(json.dumps(report), flush=True)


if __name__ == "__main__":
    main()
