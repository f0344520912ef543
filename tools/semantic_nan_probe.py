#!/usr/bin/env python
"""Chase the semantic_loss NaN on axon (train_nan_probe found it is a real
device-side NaN, not a readback artifact): dump token-mask statistics and
every loss term from (a) a forward-only compute_losses and (b) the
value_and_grad primal, same inputs.
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="ToC3D_faster")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from toc3d_tpu.configs import get_config
    from toc3d_tpu.models.detector import init_detector, extract_img_feat
    from toc3d_tpu.models.streampetr_head import init_memory
    from toc3d_tpu.runtime.train import compute_losses
    from toc3d_tpu.core.losses import token_selection_loss
    from tools.train_nan_probe import make_batch

    cfg = get_config(args.config)
    print(f"backend={jax.default_backend()}", flush=True)
    params = jax.jit(lambda k: init_detector(k, cfg))(jax.random.PRNGKey(0))
    jax.block_until_ready(params)
    memory = init_memory(1, cfg.head)
    batch = make_batch(cfg, 1)
    rng = jax.random.PRNGKey(1)

    # (a) forward-only
    def fwd(params):
        total, (losses, _) = compute_losses(params, cfg, memory, batch, rng)
        return total, losses

    total, losses = jax.jit(fwd)(params)
    print("forward-only:", flush=True)
    for k in sorted(losses):
        print(f"  {k} = {float(np.asarray(losses[k])):.6f}", flush=True)
    print(f"  total = {float(np.asarray(total)):.6f}", flush=True)

    # token-mask stats from the same backbone path the loss sees
    def masks_fn(params):
        k_mask, k_sel, k_dn, k_drop = jax.random.split(rng, 4)
        from toc3d_tpu.models.grid_mask import grid_mask
        img = batch["img"]
        if cfg.use_grid_mask:
            img = grid_mask(k_mask, img)
        feats, aux = extract_img_feat(params, cfg, img, memory, batch,
                                      rng=k_sel, remat=True, fused_ok=False)
        masks = jnp.stack([m[..., 0] for m in aux["token_masks"]])
        return (masks.min(axis=(1, 2, 3)), masks.max(axis=(1, 2, 3)),
                jnp.sum(~jnp.isfinite(masks), axis=(1, 2, 3)),
                jnp.sum((masks == 0.0), axis=(1, 2, 3)),
                jnp.sum((masks == 1.0), axis=(1, 2, 3)))

    mn, mx, nbad, n0, n1 = [np.asarray(x) for x in jax.jit(masks_fn)(params)]
    for i in range(len(mn)):
        print(f"  mask[{i}]: min={float(mn[i]):.3e} max={float(mx[i]):.6f} "
              f"nonfinite={int(nbad[i])} exact0={int(n0[i])} "
              f"exact1={int(n1[i])}", flush=True)

    # isolate: fetch masks to host, recompute the loss from a SECOND
    # program whose input is the fetched masks (breaks any in-program
    # fusion), and also recompute the focal math in numpy
    def masks_raw(params):
        k_mask, k_sel, k_dn, k_drop = jax.random.split(rng, 4)
        from toc3d_tpu.models.grid_mask import grid_mask
        img = batch["img"]
        if cfg.use_grid_mask:
            img = grid_mask(k_mask, img)
        feats, aux = extract_img_feat(params, cfg, img, memory, batch,
                                      rng=k_sel, remat=True, fused_ok=False)
        return jnp.stack([m[..., 0] for m in aux["token_masks"]])

    masks = np.asarray(jax.jit(masks_raw)(params))
    print(f"  masks host: shape={masks.shape} "
          f"nonfinite={int((~np.isfinite(masks)).sum())} "
          f"min={np.nanmin(masks):.3e} max={np.nanmax(masks):.6f}",
          flush=True)
    b, n = batch["img"].shape[:2]
    g2 = batch["gt_bboxes_2d"].shape[2]
    b2d = batch["gt_bboxes_2d"].reshape(b * n, g2, 4)
    v2d = batch["gt_valid_2d"].reshape(b * n, g2)
    sem2 = jax.jit(lambda m: token_selection_loss(
        m, b2d, v2d, patch_size=cfg.backbone.patch_size, loss_weight=5.0))(
        jnp.asarray(masks))
    print(f"  semantic_loss from fetched masks (2nd program): "
          f"{float(np.asarray(sem2)):.6f}", flush=True)

    from toc3d_tpu.core.losses import token_selection_targets
    tgt = np.asarray(jax.jit(lambda: token_selection_targets(
        b2d, v2d, masks.shape[2], masks.shape[3],
        cfg.backbone.patch_size, 0.0))())
    print(f"  targets: nonfinite={int((~np.isfinite(tgt)).sum())} "
          f"min={tgt.min():.3f} max={tgt.max():.3f} "
          f"exact1={int((tgt == 1.0).sum())}", flush=True)
    # numpy focal recompute
    p = np.clip(masks.astype(np.float64), 0, 1)
    t = np.broadcast_to(tgt[None], p.shape).astype(np.float64)
    posw = (t == 1.0)
    eps = 1e-12
    loss = (-np.log(p + eps) * (1 - p) ** 2 * posw
            - np.log(1 - p + eps) * p ** 2 * (1 - t) ** 4 * (~posw))
    print(f"  numpy focal: nonfinite={int((~np.isfinite(loss)).sum())} "
          f"mean={loss.mean():.6f}", flush=True)

    # (b) value_and_grad primal
    def loss_fn(params):
        total, (losses, _) = compute_losses(params, cfg, memory, batch, rng)
        return total, losses

    (total_g, losses_g), grads = jax.jit(
        lambda p: jax.value_and_grad(loss_fn, has_aux=True)(p))(params)
    print("value_and_grad primal:", flush=True)
    for k in sorted(losses_g):
        print(f"  {k} = {float(np.asarray(losses_g[k])):.6f}", flush=True)
    gn = np.asarray(jax.jit(
        lambda g: jnp.sqrt(sum(jnp.sum(x.astype(jnp.float32) ** 2)
                               for x in jax.tree_util.tree_leaves(g))))(grads))
    print(f"  total={float(np.asarray(total_g)):.6f} grad_norm={gn:.4f}",
          flush=True)


if __name__ == "__main__":
    main()
