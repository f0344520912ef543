"""Fused patchify-as-matmul kernel for the ViT patch embedding.

XLA lowers the 16x16/stride-16 3-channel conv (reference eva_utils.py:261)
to a convolution fusion that runs at ~10 TFLOP/s on TPU (3 input channels
map terribly onto the 128-deep MXU) plus a full-image layout copy to feed
it: ~5.2 + 2.0 ms/frame at 1600x800. This kernel reformulates the conv as
16 accumulating matmuls — out = sum_r X_r @ W_r, where X_r is patch-row r
of every patch ((rows*w, ps*3) slabs, a free row-major reinterpretation of
the input) and W_r the matching weight slice — so the MXU streams
(520, 48) @ (48, 1024) dots with the weights VMEM-resident. ~1 ms/frame.

Math parity: exact same multiply-accumulate set as the conv
(models/eva_vit.patch_embed) in the same bf16-operand/f32-accumulate
regime; differs only in summation order. Training uses a custom VJP with
the XLA conv's cotangents (same pattern as vit_block.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Test hook, mirroring cross_attn.FORCE_FUSED_ON_CPU: models/eva_vit routes
# the patch embedding through this kernel only off-CPU unless forced.
FORCE_FUSED_ON_CPU = False


def _round_up(v: int, m: int) -> int:
    return ((v + m - 1) // m) * m


def _patchify_kernel(x_ref, w_ref, b_ref, o_ref, *, ps: int, rows: int,
                     wp: int, compute_dtype):
    """x_ref: (1, rows*ps, wp, ps*3); w_ref: (ps, ps*3, C); b_ref: (1, C);
    o_ref: (1, rows, wp, C)."""
    c = w_ref.shape[-1]
    acc = jnp.zeros((rows * wp, c), jnp.float32)
    for r in range(ps):
        slabs = [x_ref[0, i * ps + r].astype(compute_dtype)
                 for i in range(rows)]                     # each (wp, ps*3)
        xr = slabs[0] if rows == 1 else jnp.concatenate(slabs, axis=0)
        acc = acc + jax.lax.dot_general(
            xr, w_ref[r], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + b_ref[0].astype(jnp.float32)
    for i in range(rows):
        o_ref[0, i] = acc[i * wp:(i + 1) * wp].astype(o_ref.dtype)


def _pick_rows(h: int) -> int:
    for cand in (5, 4, 2):
        if h % cand == 0:
            return cand
    return 1


def patchify_matmul(x, w, b, patch_size: int, compute_dtype=None,
                    interpret=None):
    """x: (B, H, W, 3); w: (ps, ps, 3, C) conv weights (HWIO); b: (C,).
    Returns (B, H/ps, W/ps, C) in compute_dtype (defaults to x.dtype)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if compute_dtype is None:
        compute_dtype = x.dtype
    ps = patch_size
    bsz, hh, ww, cin = x.shape
    assert cin == 3 and hh % ps == 0 and ww % ps == 0
    h, wcols = hh // ps, ww // ps
    c = w.shape[-1]

    # (B, H, W, 3) -> (B, H, w, ps*3) is a pure row-major reinterpretation;
    # pad the patch-column axis to a sublane multiple for the block tiling.
    wp = _round_up(wcols, 8)
    xr = x.reshape(bsz, hh, wcols, ps * 3)
    if wp > wcols:
        xr = jnp.pad(xr, ((0, 0), (0, 0), (0, wp - wcols), (0, 0)))
    wm = w.reshape(ps, ps * 3, c).astype(compute_dtype)
    bm = b.reshape(1, c)

    rows = _pick_rows(h)
    grid = (bsz, h // rows)
    kernel = functools.partial(_patchify_kernel, ps=ps, rows=rows, wp=wp,
                               compute_dtype=compute_dtype)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, rows * ps, wp, ps * 3),
                         lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rows, wp, c), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, h, wp, c), compute_dtype),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=100 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * h * wp * ps * ps * 3 * c,
            bytes_accessed=(xr.size * xr.dtype.itemsize
                            + bsz * h * wp * c * 2),
            transcendentals=0,
        ),
    )(xr, wm, bm)
    return out[:, :, :wcols]
