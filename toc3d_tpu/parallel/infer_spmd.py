"""Multi-chip low-latency serving: view-sharded streaming inference.

The reference scales inference only by adding independent DDP replicas
(throughput, not latency — dist_test.sh shards the val set). On TPU the
6 camera views are an embarrassingly-parallel axis for the backbone —
window attention, token selection and the neck never mix views (the
selector broadcasts the B-leading motion queries over however many views
it sees, token_select.query_based_score) — so a pod slice can split the
frame's views across chips and cut backbone latency ~N_dev-fold:

  program 1 (backbone+neck): `shard_map` over the 'view' mesh axis —
    each chip runs the SAME per-image program (Pallas megakernels
    included; shard_map hands them local shapes, so no GSPMD partitioning
    of custom calls is needed) on its slice of the views, zero collectives
    inside;
  program 2 (head+decode): replicated across 'view' — feats are
    all-gathered on entry (one (B, 6, h, w, 256) tensor over ICI, ~1 MB
    @800x320) and every chip runs the identical small head, keeping the
    memory bank replicated with no further traffic. The head is ~10% of
    the frame, so Amdahl loss is small; sharding the decoder would buy
    little and cost collectives per layer.

Latency x throughput: pass a 2-D ('data', 'view') product mesh
(`product_mesh`) to also shard the batch. The streaming state (memory
bank), frame fields and decode are all batch-leading and per-sample
independent, so the 'data' axis is a pure data-parallel split of both
programs — the head then runs in shard_map too (local batch shard), and
the all-gather between the programs stays view-axis-only.

Same two-program split as `make_infer_fn` (models/detector.py:218) and the
same numerics per view. B stays the batch axis (serve batch=1 for latency;
batch>1 over 'data' for throughput).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..models.detector import (DetectorConfig, DetectorState, PrecastCache,
                               _precast_backbone_params, extract_img_feat,
                               head_step)


def _view_fit(num_views: int, limit: int) -> int:
    return max(d for d in range(1, num_views + 1)
               if num_views % d == 0 and d <= limit)


def view_mesh(num_views: int = 6, n_devices: int | None = None) -> Mesh:
    """1-D 'view' mesh over the largest divisor of num_views that fits the
    available devices (6 views -> 6, 3, 2 or 1 chips)."""
    devs = jax.devices()
    limit = len(devs) if n_devices is None else min(n_devices, len(devs))
    return Mesh(np.asarray(devs[:_view_fit(num_views, limit)]), ("view",))


def product_mesh(num_views: int = 6, n_data: int | None = None,
                 n_devices: int | None = None) -> Mesh:
    """2-D ('data', 'view') mesh: 'view' gets the largest divisor of
    num_views that fits, 'data' gets n_data replicas of that column (or as
    many as the remaining devices allow). 8 devices, 6 views ->
    (1, 6) by default; n_data=2 -> (2, 3); n_data=4 -> (4, 2)."""
    devs = jax.devices()
    limit = len(devs) if n_devices is None else min(n_devices, len(devs))
    if n_data is None:
        k = _view_fit(num_views, limit)
        d = limit // k
    else:
        d = n_data
        if not 1 <= d <= limit:
            raise ValueError(
                f"n_data={d} data shards do not fit the {limit} available "
                f"device(s) (ADVICE r4: limit//d == 0 used to surface as a "
                f"bare max() error inside _view_fit)")
        k = _view_fit(num_views, limit // d)
    assert d * k <= limit, (d, k, limit)
    return Mesh(np.asarray(devs[:d * k]).reshape(d, k), ("data", "view"))


def make_spmd_infer_fn(cfg: DetectorConfig, mesh: Mesh):
    """Build `infer(params, state, frame) -> (state', DecodedBoxes)` with
    the backbone view-sharded over `mesh` ('view' axis) and the head
    replicated — or, for a ('data', 'view') product mesh, both programs
    additionally batch-sharded over 'data'. Drop-in for make_infer_fn;
    requires frame['img'] view count divisible by the 'view' mesh size
    (and batch divisible by the 'data' size, if present).

    Deterministic eval only (the gumbel strict-parity mask would need a
    per-view PRNG split across shards; use make_infer_fn for that).
    """
    assert "view" in mesh.axis_names, mesh.axis_names
    if getattr(cfg.backbone, "eval_mask", "softmax") == "gumbel":
        raise ValueError("stochastic eval mask is single-chip only; "
                         "use make_infer_fn")
    dn = "data" if "data" in mesh.axis_names else None
    repl = NamedSharding(mesh, P())
    img_s = NamedSharding(mesh, P(dn, "view"))
    data_s = NamedSharding(mesh, P(dn))

    def bb_local(p, img, memory, frame):
        # img: (B/d, N/k, H, W, 3) local slice; memory/frame replicated
        # (or batch-shards on a product mesh). extract_img_feat treats the
        # local view count as N — every op in the backbone/neck is
        # per-image, so the local program is exactly the single-chip one on
        # fewer views; the selector's motion queries are B-leading, so a
        # batch shard is likewise just a smaller B.
        return extract_img_feat(p, cfg, img, memory, frame)[0]

    bb_sharded = shard_map(
        bb_local, mesh=mesh,
        in_specs=(P(), P(dn, "view"), P(dn), P(dn)),
        out_specs=P(dn, "view"), check_vma=False)
    # feats leave the backbone program gathered over 'view':
    # out_shardings makes XLA all-gather the view shards over ICI as the
    # program epilogue (one (B, N, h, w, C) tensor per data shard), so the
    # head sees full frames and state.memory needs no broadcast.
    ex = jax.jit(bb_sharded, out_shardings=data_s)
    if dn is None:
        # head replicated: every chip runs the identical small program.
        hd = jax.jit(lambda p, s, feats, f: head_step(p, cfg, s, feats, f),
                     in_shardings=(repl, repl, repl, repl),
                     out_shardings=repl)
    else:
        # batch-sharded head: shard_map (not GSPMD jit) so the Pallas flash
        # decoder kernel sees local shapes — the head is per-sample
        # independent (per-sample memory bank, top-k, DN-free at eval).
        hd = jax.jit(shard_map(
            lambda p, s, feats, f: head_step(p, cfg, s, feats, f),
            mesh=mesh, in_specs=(P(), P(dn), P(dn), P(dn)),
            out_specs=P(dn), check_vma=False))
    # params may arrive committed to a different mesh (e.g. the training
    # mesh right after a train step); reshard onto this mesh first — jit
    # refuses mixed device sets. Cache keyed on leaf identity (PrecastCache)
    # — id(<pytree>) can be recycled after GC and would serve stale weights.
    precast = PrecastCache(lambda p: jax.jit(
        lambda q: _precast_backbone_params(q, cfg),
        out_shardings=repl)(jax.device_put(p, repl)))

    def infer(params, state: DetectorState, frame):
        p = precast(params)
        k = mesh.shape["view"]
        n = frame["img"].shape[1]
        assert n % k == 0, f"{n} views not divisible by {k} chips"
        if dn is not None:
            b = frame["img"].shape[0]
            d = mesh.shape["data"]
            assert b % d == 0, f"batch {b} not divisible by {d} data shards"
        img = jax.device_put(frame["img"], img_s)
        # the backbone/head read only the non-image frame fields (motion
        # ctx, PE geometry); img rides in sharded as its own argument
        frame_r = {kk: jax.device_put(v, data_s) for kk, v in frame.items()
                   if kk != "img"}
        state = jax.device_put(state, data_s)
        feats = ex(p, img, state.memory, frame_r)
        return hd(p, state, feats, frame_r)

    return infer
