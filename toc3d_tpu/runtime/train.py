"""Training: loss assembly, optimizer, jittable train step.

Capability parity targets:
  runner glue      -> reference core/apis/mmdet_train.py (custom_train_detector)
  optimizer        -> AdamW lr 1e-4, backbone lr x0.1, weight decay 0.01,
                      grad clip 35, linear warmup 500 @ 1/3, cosine to 1e-3
                      (ToC3D_fast.py:253-271)
  forward_pts_train / obtain_history_memory -> petr3d.py:262-397 (the shipped
      ToC3D configs train with queue_length=1 / num_frame_losses=1, i.e. one
      frame per iteration with the memory bank streamed across iterations by
      the batch-lane sampler; that is what train_step implements)

TPU-native: bf16 activations via cfg.compute_dtype (no loss scaling —
reference needs fp16 dynamic scaling, bf16 does not), remat per block /
decoder layer, gradient averaging implicit in global-batch math under pjit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from ..models.detector import DetectorConfig, extract_img_feat
from ..models.streampetr_head import (MemoryBank, init_memory, head_forward,
                                      location_grid)
from ..models.focal_head import focal_head_forward
from ..models.focal_head_loss import focal_head_loss
from ..models.streampetr_loss import streampetr_loss
from ..models.grid_mask import grid_mask
from ..models.toc3d_vit import ToC3DViTConfig
from ..core.dn import prepare_for_dn, dn_reference_points
from ..core.losses import token_selection_loss


class TrainState(NamedTuple):
    params: dict
    opt_state: tuple
    memory: MemoryBank
    step: jnp.ndarray


def make_lr_schedule(base_lr=1e-4, warmup_iters=500, warmup_ratio=1.0 / 3,
                     total_iters=42_000, min_lr_ratio=1e-3):
    """Linear warmup then cosine annealing (ToC3D_fast.py:265-271)."""
    warmup = optax.linear_schedule(base_lr * warmup_ratio, base_lr,
                                   warmup_iters)
    cosine = optax.cosine_decay_schedule(base_lr,
                                         max(total_iters - warmup_iters, 1),
                                         alpha=min_lr_ratio)
    return optax.join_schedules([warmup, cosine], [warmup_iters])


def _is_backbone(path) -> bool:
    return any(getattr(p, "key", None) == "img_backbone"
               or getattr(p, "name", None) == "img_backbone" for p in path)


class SkipNonFiniteState(NamedTuple):
    total_notfinite: jnp.ndarray   # int32 running count of skipped steps
    inner_state: tuple


def skip_on_nonfinite(inner):
    """optax.apply_if_finite, keyed on isfinite(global_norm(grads)) instead
    of a per-leaf finiteness sweep.

    Equivalent detection: any NaN/±Inf leaf makes the sum of squares
    NaN/Inf, so the norm is non-finite iff some leaf is (plus the harmless
    corner where a finite gradient's norm overflows f32, ||g|| > ~1.8e19 —
    at clip_norm 35 such a step is garbage anyway and skipping it is fine).
    Why: the train step already computes optax.global_norm(grads) for
    metrics and clip_by_global_norm computes it again inside the chain, so
    XLA CSEs this check to ~nothing, while apply_if_finite's per-leaf sweep
    measured 23 ms/step (6%) at 800x320 (708 is-finite reduce fusions,
    tools/profile_backbone.py --train). Branchless: the inner update runs
    unconditionally and a scalar select keeps the old state/zero update on
    the bad step — the selects fuse into the inner update's elementwise
    chain (no lax.cond, whose operands would materialize both trees).
    State exposes the same total_notfinite telemetry the train steps log.
    """
    def init_fn(params):
        return SkipNonFiniteState(jnp.zeros((), jnp.int32),
                                  inner.init(params))

    def update_fn(updates, state, params=None):
        ok = jnp.isfinite(optax.global_norm(updates))
        new_updates, new_inner = inner.update(updates, state.inner_state,
                                              params)
        out_updates = jax.tree_util.tree_map(
            lambda u: jnp.where(ok, u, jnp.zeros_like(u)), new_updates)
        out_inner = jax.tree_util.tree_map(
            lambda new, old: jnp.where(ok, new, old),
            new_inner, state.inner_state)
        return out_updates, SkipNonFiniteState(
            state.total_notfinite + (1 - ok.astype(jnp.int32)), out_inner)

    return optax.GradientTransformation(init_fn, update_fn)


def param_labels(params):
    """'backbone' / 'rest' LR-group label per leaf (paramwise custom_keys
    img_backbone lr_mult 0.1, ToC3D_fast.py:256). Exposed for tests: a typo
    in _is_backbone would silently train the backbone at full LR."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: "backbone" if _is_backbone(path) else "rest", params)


def layer_decay_mults(params, layer_decay):
    """Per-leaf layer-wise LR decay multipliers (get_vit_lr_decay_rate,
    eva_vit.py:574-591), keyed on the flattened path string."""
    from ..models.eva_vit import get_vit_lr_decay_rate
    depth = len(params["img_backbone"]["blocks"])

    def path_str(path):
        parts = []
        for p in path:
            parts.append(str(getattr(p, "key", getattr(p, "idx", p))))
        return "/".join(parts)

    return jax.tree_util.tree_map_with_path(
        lambda path, _: get_vit_lr_decay_rate(path_str(path),
                                              layer_decay, depth),
        params)


def make_optimizer(params, base_lr=1e-4, weight_decay=0.01, clip_norm=35.0,
                   backbone_lr_mult=0.1, total_iters=42_000,
                   warmup_iters=500, layer_decay=None):
    """AdamW with backbone lr x0.1 (paramwise custom_keys, ToC3D_fast.py:256).

    layer_decay: optional ViT layer-wise lr decay rate
    (get_vit_lr_decay_rate, eva_vit.py:574-591); unused by the shipped ToC3D
    configs but part of the reference's training surface.
    """
    sched = make_lr_schedule(base_lr, warmup_iters, total_iters=total_iters)
    sched_bb = make_lr_schedule(base_lr * backbone_lr_mult, warmup_iters,
                                total_iters=total_iters)
    labels = param_labels(params)
    chain = [
        optax.clip_by_global_norm(clip_norm),
        optax.multi_transform(
            {"backbone": optax.adamw(sched_bb, weight_decay=weight_decay),
             "rest": optax.adamw(sched, weight_decay=weight_decay)},
            labels),
    ]
    if layer_decay is not None:
        mults = layer_decay_mults(params, layer_decay)
        chain.append(optax.GradientTransformation(
            lambda p: optax.EmptyState(),
            lambda updates, state, params=None: (
                jax.tree_util.tree_map(lambda u, m: u * m, updates, mults),
                state)))
    # Skip steps whose gradients are non-finite instead of poisoning the
    # params — the reference's Fp16OptimizerHook does exactly this (mmcv
    # dynamic loss scaling skips the optimizer step on inf/nan grads,
    # ToC3D_fast.py:263, and it skips indefinitely). skip_on_nonfinite is
    # our norm-keyed, branchless apply_if_finite (see its docstring: the
    # per-leaf sweep cost 6% of the step; optax's max_consecutive_errors
    # would also eventually ACCEPT a bad update, which this never does).
    # Divergence is surfaced externally by metrics["nonfinite_skips"]
    # (tools/train.py logs it every iteration; bench.py --train asserts
    # it is 0).
    return skip_on_nonfinite(optax.chain(*chain))


def init_train_state(params, tx, batch_size: int,
                     cfg: DetectorConfig) -> TrainState:
    return TrainState(params=params, opt_state=tx.init(params),
                      memory=init_memory(batch_size, cfg.head),
                      step=jnp.zeros((), jnp.int32))


# ---------------------------------------------------------------------------
# loss assembly (one frame — the shipped ToC3D training regime)
# ---------------------------------------------------------------------------

def compute_losses(params, cfg: DetectorConfig, memory: MemoryBank, batch,
                   rng, remat: bool = True, with_losses: bool = True,
                   backbone_grad: bool = True, injected=None,
                   view_scan=False, attn_chunk: Optional[int] = None):
    """batch dict (B-leading; G3/G2 are static padded GT counts):
      img (B, N, H, W, 3), intrinsics/img2lidar (B, N, 4, 4),
      timestamp (B,), ego_pose/ego_pose_inv (B, 4, 4), prev_exists (B,),
      gt_bboxes_3d (B, G3, 9) gravity-center, gt_labels_3d (B, G3),
      gt_valid_3d (B, G3),
      gt_bboxes_2d (B, N, G2, 4) xyxy px, gt_labels_2d (B, N, G2),
      gt_centers_2d (B, N, G2, 2), gt_valid_2d (B, N, G2).
    Returns (total_loss, (loss_dict, new_memory)).
    """
    k_mask, k_sel, k_dn, k_drop = jax.random.split(rng, 4)
    img = batch["img"]
    b, n = img.shape[:2]
    if cfg.use_grid_mask:
        img = grid_mask(k_mask, img)

    # fused_ok=False: Pallas custom calls compiled into this single
    # differentiated program kernel-fault the axon TPU worker (both the
    # block megakernels and the patchify kernel; bisected 2026-08-17 —
    # same XLA:TPU bug class as the inference bf16/fp32 one-program fault
    # behind make_infer_fn's two-program split). The XLA paths are the
    # exact-gradient reference the custom VJPs re-derive through anyway.
    # injected: per-site backbone outputs precomputed by the Pallas program
    # of the two-program split (make_split_train_step) — forward values from
    # the kernels, backward linearized through the XLA path, still zero
    # Pallas custom calls in THIS (differentiated) program.
    feats, aux = extract_img_feat(params, cfg, img, memory, batch,
                                  rng=k_sel, remat=remat, fused_ok=False,
                                  injected=injected, view_scan=view_scan,
                                  attn_chunk=attn_chunk)
    if not backbone_grad:
        # reference runs history-frame backbones under torch.no_grad
        # (petr3d.py:262-308, num_frame_backbone_grads): head/neck-side
        # losses may still flow, but nothing reaches backbone params
        # (including the token selectors, whose masks live in aux).
        feats = jax.lax.stop_gradient(feats)
        aux = jax.tree_util.tree_map(jax.lax.stop_gradient, aux)
    fh, fw = feats.shape[2], feats.shape[3]

    # 2D aux head (train-time token ranking + losses)
    locs = location_grid(fh, fw, cfg.stride, *cfg.pad_shape)
    outs_roi = focal_head_forward(params["img_roi_head"], cfg.focal, feats,
                                  locs, cfg.focal.train_ratio)
    topk_indexes = outs_roi["topk_indexes"]

    # denoising prep
    dn = prepare_for_dn(k_dn, cfg.head, batch["gt_bboxes_3d"],
                        batch["gt_labels_3d"], batch["gt_valid_3d"])
    dn_for_head = {
        "padded_reference_points": dn_reference_points(
            dn, params["pts_bbox_head"]["reference_points"], b),
        "attn_mask": dn["attn_mask"],
        "pad_size": dn["pad_size"],
    }

    data = {k: batch[k] for k in ("intrinsics", "img2lidar", "timestamp",
                                  "ego_pose", "ego_pose_inv", "prev_exists")}
    data["pad_shape"] = cfg.pad_shape
    # fused_ok=False here too: with dropout=0.0 the decoder's flash-attn
    # gate would otherwise compile the Pallas custom call into the train
    # program (the kernel-faulting configuration).
    outs, new_memory = head_forward(params["pts_bbox_head"], cfg.head, feats,
                                    data, memory, topk_indexes=topk_indexes,
                                    dn=dn_for_head, rng=k_drop, remat=remat,
                                    fused_ok=False)

    if not with_losses:
        # history frame: memory update only (petr3d.py forward_pts_train
        # with return_losses=False)
        return jnp.zeros((), jnp.float32), ({}, new_memory)

    losses = streampetr_loss(cfg.head, outs, batch["gt_bboxes_3d"],
                             batch["gt_labels_3d"], batch["gt_valid_3d"],
                             dn=dn)

    # 2D losses (flatten views)
    g2 = batch["gt_bboxes_2d"].shape[2]
    losses.update(focal_head_loss(
        cfg.focal, outs_roi,
        batch["gt_bboxes_2d"].reshape(b * n, g2, 4),
        batch["gt_labels_2d"].reshape(b * n, g2),
        batch["gt_centers_2d"].reshape(b * n, g2, 2),
        batch["gt_valid_2d"].reshape(b * n, g2),
        cfg.pad_shape))

    # token-selection supervision (ToC3D only)
    if aux is not None and aux["token_masks"]:
        masks = jnp.stack([m[..., 0] for m in aux["token_masks"]])  # (L,BN,h,w)
        losses["semantic_loss"] = token_selection_loss(
            masks, batch["gt_bboxes_2d"].reshape(b * n, g2, 4),
            batch["gt_valid_2d"].reshape(b * n, g2),
            patch_size=cfg.backbone.patch_size, loss_weight=5.0)

    total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
    return total, (losses, new_memory)


def compute_losses_multiframe(params, cfg: DetectorConfig,
                              memory: MemoryBank, batch, rng,
                              remat: bool = True,
                              view_scan=False,
                              attn_chunk: Optional[int] = None):
    """Sliding-window multi-frame training (reference petr3d.py:262-308,
    obtain_history_memory / forward_train with queue_length > 1).

    batch arrays carry a T axis after B: img (B, T, N, H, W, 3), intrinsics
    (B, T, N, 4, 4), timestamp (B, T), ego_pose[_inv] (B, T, 4, 4),
    prev_exists (B, T), gt_* (B, T, ...). The last cfg.num_frame_head_grads
    frames get head/neck gradients, the last cfg.num_frame_backbone_grads
    frames additionally get backbone gradients (the reference runs earlier
    frames' backbones in no_grad eval mode, petr3d.py:262-308); losses come
    from the last cfg.num_frame_losses frames, keyed 'frame_{t}_...'.
    """
    t_total = batch["img"].shape[1]
    n_grad = cfg.num_frame_head_grads
    n_bb_grad = cfg.num_frame_backbone_grads
    n_loss = cfg.num_frame_losses
    losses = {}
    totals = []
    for t in range(t_total):
        frame = {k: (v[:, t] if k != "pad_shape" else v)
                 for k, v in batch.items()}
        rng, k = jax.random.split(rng)
        grad_frame = t >= t_total - n_grad
        loss_frame = t >= t_total - n_loss
        bb_grad_frame = t >= t_total - n_bb_grad
        total, (ld, memory) = compute_losses(params, cfg, memory, frame, k,
                                             remat=remat,
                                             with_losses=loss_frame,
                                             backbone_grad=bb_grad_frame,
                                             view_scan=view_scan,
                                             attn_chunk=attn_chunk)
        if not grad_frame:
            total = jax.lax.stop_gradient(total)
            ld = jax.tree_util.tree_map(jax.lax.stop_gradient, ld)
            memory = jax.tree_util.tree_map(jax.lax.stop_gradient, memory)
        if loss_frame:
            totals.append(total)
            for k2, v in ld.items():
                losses[f"frame_{t}_{k2}"] = v
    return sum(totals), (losses, memory)


def collect_backbone_outs(params, cfg: DetectorConfig, memory: MemoryBank,
                          batch, rng):
    """Phase A of the two-program training split: run the backbone forward
    with the Pallas kernels (non-differentiated, so the axon Pallas-in-
    autodiff fault never arises) and return the per-site outputs
    compute_losses(injected=...) will consume. MUST mirror compute_losses'
    preamble exactly (same rng split, same grid-mask) so both programs see
    identical inputs at every block boundary."""
    from ..models.detector import extract_img_feat
    k_mask, k_sel, _, _ = jax.random.split(rng, 4)
    img = batch["img"]
    if cfg.use_grid_mask:
        img = grid_mask(k_mask, img)
    _, _, collected = extract_img_feat(params, cfg, img, memory, batch,
                                       rng=k_sel, remat=False, fused_ok=True,
                                       collect_block_outs=True)
    return collected


def make_split_train_step(cfg: DetectorConfig, tx,
                          attn_chunk: Optional[int] = None,
                          remat: bool = True):
    """Two-program train step (VERDICT r3 #3): the Pallas megakernels +
    patchify run the backbone FORWARD in a separate non-differentiated
    program; the differentiated program receives those outputs as inputs
    and re-derives exact gradients through the XLA paths at the same
    linearization points (ops.pallas.vit_block.make_injected_op). Neither
    program contains the faulting configuration (Pallas custom call inside
    an autodiff'd XLA:TPU module, bisected 2026-08-17).

    Semantics: identical update to make_train_step up to the kernels'
    forward rounding (the same 3e-4 envelope the inference kernels carry);
    on CPU (kernels gated off) the collected outputs ARE the XLA values and
    the update matches make_train_step exactly — pinned by
    tests/test_split_train.py. Single-frame regime only (the shipped ToC3D
    recipe); droppath-active full blocks stay inline (injectable_sites).

    Returns train_step(state, batch, rng) -> (state, metrics); the two jits
    live inside."""
    collect = jax.jit(
        lambda params, memory, batch, rng: collect_backbone_outs(
            params, cfg, memory, batch, rng))

    def loss_fn(params, memory, batch, rng, injected):
        return compute_losses(params, cfg, memory, batch, rng, remat=remat,
                              injected=injected, attn_chunk=attn_chunk)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def update(state: TrainState, batch, rng, injected):
        (total, (losses, new_memory)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, state.memory, batch, rng,
                                   injected)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_memory = jax.tree_util.tree_map(jax.lax.stop_gradient, new_memory)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        if hasattr(opt_state, "total_notfinite"):
            metrics["nonfinite_skips"] = opt_state.total_notfinite
        return TrainState(params, opt_state, new_memory,
                          state.step + 1), metrics

    def train_step(state: TrainState, batch, rng):
        injected = collect(state.params, state.memory, batch, rng)
        return update(state, batch, rng, injected)

    return train_step


def auto_view_scan(cfg: DetectorConfig) -> bool:
    """Default view_scan policy: scan the backbone over camera views when
    the resolution is large enough that the unscanned fwd+bwd overflows
    the chip's HBM (measured: 1600x800 needs 19.6 GB of HLO temps vs
    v5e's 15.75 GB; 800x320 fits comfortably and the batched-window
    matmuls are faster unscanned)."""
    h, w = cfg.pad_shape
    return h * w > 500_000


def make_train_step(cfg: DetectorConfig, tx, view_scan=None,
                    remat: bool = True, attn_chunk: Optional[int] = None,
                    multiframe: bool = False):
    """Returns train_step(state, batch, rng) -> (state, metrics).

    view_scan: None -> auto_view_scan(cfg); True/int -> scan the backbone
    over views (int = views per scan chunk); see extract_img_feat.
    remat: per-block/per-decoder-layer jax.checkpoint (default on — the
    reference trains with `with_cp=True` everywhere). view_scan already
    cuts peak HBM ~N-fold, so remat=False is a measurable speed knob at
    1600x800 (bench.py --no-remat).
    attn_chunk: bounded-memory backbone attention (ops.attention
    _sdpa_chunked); with it the UNSCANNED 1600x800 step fits in HBM.
    multiframe: batch carries a T axis after B and the loss is
    compute_losses_multiframe (reference queue_length > 1 regime,
    petr3d.py:262-308 obtain_history_memory)."""
    if view_scan is None:
        view_scan = auto_view_scan(cfg) and attn_chunk is None
    loss = compute_losses_multiframe if multiframe else compute_losses

    def train_step(state: TrainState, batch, rng):
        (total, (losses, new_memory)), grads = jax.value_and_grad(
            loss, has_aux=True)(state.params, cfg, state.memory,
                                batch, rng, remat=remat,
                                view_scan=view_scan,
                                attn_chunk=attn_chunk)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        new_memory = jax.tree_util.tree_map(jax.lax.stop_gradient, new_memory)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        if hasattr(opt_state, "total_notfinite"):
            # optax.apply_if_finite wrapper (see make_optimizer): running
            # count of skipped non-finite steps, mirroring the reference
            # Fp16OptimizerHook's skip-on-overflow telemetry
            metrics["nonfinite_skips"] = opt_state.total_notfinite
        return TrainState(params, opt_state, new_memory,
                          state.step + 1), metrics

    return train_step
