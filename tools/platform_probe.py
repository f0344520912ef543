#!/usr/bin/env python
"""Re-test the known axon/XLA:TPU platform faults after every jax/axon bump.

Each case runs in a SUBPROCESS (a kernel fault kills the TPU worker /
process) and prints pass/fail. When a case starts passing, the matching
workaround can be retired:

  one_program_infer   — bf16 backbone + fp32 head compiled into ONE program
                        at 1600x800 kernel-faults (workaround: two-program
                        split, models/detector.make_infer_fn).
  pallas_in_train     — a Pallas custom call compiled into a differentiated
                        train program kernel-faults (workaround: fused_ok=
                        False threaded through the train step).
  train_metrics_readback (--full) — differentiated full-size train program
                        reads NaN loss/grad_norm (workaround: two-program
                        metrics laundering / apply_if_finite telemetry).

Usage: python tools/platform_probe.py [--full]
"""
import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def _case_one_program_infer():
    import jax
    import numpy as np
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import (init_detector, init_state,
                                           infer_step)
    cfg = get_config("ToC3D_faster_1600")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    state = init_state(1, cfg)
    rng = np.random.RandomState(0)
    h, w = cfg.pad_shape
    eye = np.tile(np.eye(4, dtype=np.float32), (1, 6, 1, 1))
    intr = eye.copy()
    intr[..., 0, 0] = intr[..., 1, 1] = 1.2e3
    frame = {
        "img": rng.randn(1, 6, h, w, 3).astype(np.float32),
        "intrinsics": intr, "img2lidar": eye,
        "timestamp": np.full((1,), 0.5, np.float32),
        "ego_pose": np.eye(4, dtype=np.float32)[None],
        "ego_pose_inv": np.eye(4, dtype=np.float32)[None],
        "prev_exists": np.zeros((1,), np.float32),
    }
    step = jax.jit(lambda p, s, f: infer_step(p, cfg, s, f))
    state, det = step(params, state, frame)
    s = np.asarray(det.scores)  # force completion through the tunnel
    assert np.isfinite(s).all(), "non-finite scores"


def _case_pallas_in_train():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from toc3d_tpu.ops.pallas.vit_block import make_trainable_full_block
    from toc3d_tpu.models.eva_vit import (_block_forward_xla, init_block,
                                          EVAViTConfig)
    from toc3d_tpu.ops.rope import build_rope_table
    c, heads, ws = 64, 2, 8
    cfg = EVAViTConfig(embed_dim=c, num_heads=heads, mlp_ratio=2.0,
                       window_size=ws)
    p = init_block(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.RandomState(0)
                    .randn(2, 16, 16, c).astype(np.float32))
    tables = tuple(build_rope_table(c // heads // 2, ws, ws))
    xla_fn = lambda p_, x_, t_: _block_forward_xla(p_, x_, cfg, ws,
                                                   t_ if t_ else None)
    f = make_trainable_full_block(xla_fn, heads, ws)
    g = jax.jit(jax.grad(lambda p_, x_: jnp.sum(f(p_, x_, tables) ** 2),
                         argnums=1))(p, x)
    gn = float(np.asarray(jnp.linalg.norm(g.ravel())))
    assert np.isfinite(gn), "non-finite grad"


def _case_train_metrics_readback():
    # run the probe's base variant one step and check host metrics finite
    import numpy as np
    import jax
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector
    from toc3d_tpu.runtime.train import (make_optimizer, init_train_state,
                                         make_train_step)
    from tools.train_nan_probe import make_batch
    cfg = get_config("ToC3D_faster")
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    tx = make_optimizer(params, total_iters=1000)
    state = init_train_state(params, tx, 1, cfg)
    step = jax.jit(make_train_step(cfg, tx), donate_argnums=(0,))
    state, metrics = step(state, make_batch(cfg, 1), jax.random.PRNGKey(1))
    bad = [k for k, v in metrics.items()
           if not np.isfinite(np.asarray(v)).all()]
    assert not bad, f"non-finite host readback: {bad}"


CASES = {
    "one_program_infer": _case_one_program_infer,
    "pallas_in_train": _case_pallas_in_train,
    "train_metrics_readback": _case_train_metrics_readback,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--case", help="(internal) run one case in-process")
    ap.add_argument("--full", action="store_true",
                    help="include the expensive train-readback case")
    ap.add_argument("--timeout", type=int, default=1200)
    args = ap.parse_args()

    if args.case:
        CASES[args.case]()
        print(f"{args.case}: PASS")
        return

    names = ["one_program_infer", "pallas_in_train"]
    if args.full:
        names.append("train_metrics_readback")
    results = {}
    for name in names:
        r = subprocess.run([sys.executable, __file__, "--case", name],
                           capture_output=True, text=True,
                           timeout=args.timeout)
        ok = r.returncode == 0
        results[name] = "PASS" if ok else "FAIL"
        print(f"{name}: {results[name]}")
        if not ok:
            tail = (r.stderr or r.stdout).strip().splitlines()[-3:]
            for line in tail:
                print(f"    {line}")
    print(json.dumps(results))


if __name__ == "__main__":
    main()
