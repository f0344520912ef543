"""Multi-chip low-latency serving: view-sharded streaming inference.

The reference scales inference only by adding independent DDP replicas
(throughput, not latency — dist_test.sh shards the val set). On TPU the
6 camera views are an embarrassingly-parallel axis for the backbone —
window attention, token selection and the neck never mix views (the
selector broadcasts the B-leading motion queries over however many views
it sees, token_select.query_based_score) — so a pod slice can split the
frame's views across chips and cut backbone latency ~N_dev-fold:

  program 1 (backbone+neck): `shard_map` over a 1-D 'view' mesh axis —
    each chip runs the SAME per-image program (Pallas megakernels
    included; shard_map hands them local shapes, so no GSPMD partitioning
    of custom calls is needed) on its slice of the views, zero collectives
    inside;
  program 2 (head+decode): replicated — feats are all-gathered on entry
    (one (B, 6, h, w, 256) tensor over ICI, ~1 MB @800x320) and every chip
    runs the identical small head, keeping the memory bank replicated with
    no further traffic. The head is ~10% of the frame, so Amdahl loss is
    small; sharding the decoder would buy little and cost collectives per
    layer.

Same two-program split as `make_infer_fn` (models/detector.py:218) and the
same numerics per view. B stays the batch axis (serve batch=1 for latency;
combine with an outer 'data' axis for throughput — the mesh is the product).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.detector import (DetectorConfig, DetectorState,
                               _precast_backbone_params, extract_img_feat,
                               head_step)


def view_mesh(num_views: int = 6, n_devices: int | None = None) -> Mesh:
    """1-D 'view' mesh over the largest divisor of num_views that fits the
    available devices (6 views -> 6, 3, 2 or 1 chips)."""
    devs = jax.devices()
    limit = len(devs) if n_devices is None else min(n_devices, len(devs))
    k = max(d for d in range(1, num_views + 1)
            if num_views % d == 0 and d <= limit)
    return Mesh(np.asarray(devs[:k]), ("view",))


def make_spmd_infer_fn(cfg: DetectorConfig, mesh: Mesh):
    """Build `infer(params, state, frame) -> (state', DecodedBoxes)` with
    the backbone view-sharded over `mesh` ('view' axis) and the head
    replicated. Drop-in for make_infer_fn; requires frame['img'] view
    count divisible by the mesh size.

    Deterministic eval only (the gumbel strict-parity mask would need a
    per-view PRNG split across shards; use make_infer_fn for that).
    """
    assert "view" in mesh.axis_names, mesh.axis_names
    if getattr(cfg.backbone, "eval_mask", "softmax") == "gumbel":
        raise ValueError("stochastic eval mask is single-chip only; "
                         "use make_infer_fn")
    repl = NamedSharding(mesh, P())
    view_s = NamedSharding(mesh, P(None, "view"))

    def bb_local(p, img, memory, frame):
        # img: (B, N/k, H, W, 3) local slice; memory/frame replicated.
        # extract_img_feat treats the local view count as N — every op in
        # the backbone/neck is per-image, so the local program is exactly
        # the single-chip one on fewer views.
        return extract_img_feat(p, cfg, img, memory, frame)[0]

    bb_sharded = shard_map(
        bb_local, mesh=mesh,
        in_specs=(P(), P(None, "view"), P(), P()),
        out_specs=P(None, "view"), check_vma=False)
    # feats leave the backbone program replicated: out_shardings=repl makes
    # XLA all-gather the view shards over ICI as the program epilogue
    # (one (B, N, h, w, C) tensor), so every chip then runs the identical
    # head program and state.memory stays replicated with no broadcast.
    ex = jax.jit(bb_sharded, out_shardings=repl)
    hd = jax.jit(lambda p, s, feats, f: head_step(p, cfg, s, feats, f),
                 in_shardings=(repl, repl, repl, repl),
                 out_shardings=repl)
    precast = jax.jit(lambda p: _precast_backbone_params(p, cfg),
                      out_shardings=repl)
    cache = {}

    def infer(params, state: DetectorState, frame):
        key = id(params)
        if key not in cache:
            cache.clear()
            # params may arrive committed to a different mesh (e.g. the
            # training mesh right after a train step); reshard onto this
            # mesh first — jit refuses mixed device sets.
            cache[key] = precast(jax.device_put(params, repl))
        p = cache[key]
        k = mesh.devices.size
        n = frame["img"].shape[1]
        assert n % k == 0, f"{n} views not divisible by {k} chips"
        img = jax.device_put(frame["img"], view_s)
        # the backbone/head read only the non-image frame fields (motion
        # ctx, PE geometry); img rides in sharded as its own argument
        frame_r = {kk: jax.device_put(v, repl) for kk, v in frame.items()
                   if kk != "img"}
        state = jax.device_put(state, repl)
        feats = ex(p, img, state.memory, frame_r)
        return hd(p, state, feats, frame_r)

    return infer
