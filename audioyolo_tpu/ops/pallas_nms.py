"""Pallas TPU kernel for greedy 1-D interval NMS (experimental alternative).

The whole per-clip problem (pairwise IoU matrix + alive mask) fits in VMEM
(~1.7 MB at K=640): the kernel builds the IoU matrix once on-chip and runs the
greedy loop entirely out of VMEM. Semantics are identical to
``ops.nms._greedy_suppress`` (torchvision-style strict-threshold greedy NMS on
score-sorted proposals) — verified bit-identical on TPU.

Status: NOT the default path. Measured on TPU v5e (B=32, K=630): this kernel
4.1 ms vs 2.2 ms for the XLA ``fori_loop`` formulation — Mosaic's per-step
scalar extraction and the in-kernel transposes dominate; XLA's loop is already
compute-light. Kept as a correct, tested baseline for a future fused
decode+NMS kernel (where folding the softmax/score/sort stages in could win
back the difference).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _nms_kernel(x1_ref, x2_ref, valid_ref, out_ref, iou_scratch, alive_scratch, *, k_pad, iou_threshold):
    # All tensor work is kept >= 2-D (Mosaic-friendly); the pairwise IoU is
    # built from (k, 1) x (1, k) broadcasts of explicitly reshaped operands.
    x1r = x1_ref[0]  # (1, k_pad)
    x2r = x2_ref[0]
    x1_row = jnp.broadcast_to(x1r, (k_pad, k_pad))          # varies along lanes
    x2_row = jnp.broadcast_to(x2r, (k_pad, k_pad))
    x1_colT = x1_row.T                                      # varies along sublanes
    x2_colT = x2_row.T
    inter = jnp.maximum(jnp.minimum(x2_colT, x2_row) - jnp.maximum(x1_colT, x1_row), 0.0)
    w_row = jnp.maximum(x2_row - x1_row, 0.0)
    w_colT = jnp.maximum(x2_colT - x1_colT, 0.0)
    union = w_colT + w_row - inter
    iou_scratch[...] = inter / jnp.maximum(union, 1e-12)

    alive_scratch[...] = valid_ref[0].astype(jnp.float32)  # (1, k_pad)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)

    def body(i, _):
        keep_i = jnp.sum(jnp.where(col == i, alive_scratch[...], 0.0))
        row = iou_scratch[pl.ds(i, 1), :]  # (1, k_pad)
        suppress = (keep_i > 0.0) & (row > iou_threshold) & (col > i)
        alive_scratch[...] = jnp.where(suppress, 0.0, alive_scratch[...])
        return 0

    jax.lax.fori_loop(0, k_pad, body, 0)
    out_ref[...] = (alive_scratch[...] > 0.0)[None]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "interpret"))
def greedy_suppress_pallas(
    x1_sorted: jax.Array,
    x2_sorted: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    interpret: bool = False,
) -> jax.Array:
    """(B, K) score-sorted interval bounds + validity -> (B, K) keep flags."""
    b, k = x1_sorted.shape
    k_pad = _round_up(k, 128)
    pad = ((0, 0), (0, k_pad - k))
    # leading singleton axis so BlockSpecs satisfy the (sublane, lane)
    # divisible-or-full constraint: blocks are (1, 1, k_pad)
    x1p = jnp.pad(x1_sorted.astype(jnp.float32), pad)[:, None, :]
    x2p = jnp.pad(x2_sorted.astype(jnp.float32), pad)[:, None, :]
    vp = jnp.pad(valid, pad)[:, None, :]

    kernel = functools.partial(_nms_kernel, k_pad=k_pad, iou_threshold=float(iou_threshold))
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k_pad), jnp.bool_),
        scratch_shapes=[
            pltpu.VMEM((k_pad, k_pad), jnp.float32),
            pltpu.VMEM((1, k_pad), jnp.float32),
        ],
        interpret=interpret,
    )(x1p, x2p, vp)
    return out[:, 0, :k]


def _nms_blocked_kernel(
    x1row_ref, x2row_ref, x1col_ref, x2col_ref, valid_ref, out_ref,
    *, k_pad, block, iou_threshold,
):
    """Chunked greedy NMS, VMEM-resident (see ``greedy_suppress_pallas_blocked``).

    Mosaic-safe building blocks only: no transposes, no minor-dim reshapes,
    no dynamic *lane* slices. Dynamic-lane gather/scatter of the alive vector
    (the round-2 kernel's per-step scalar-extraction wall) is expressed as
    tiny MXU matmuls against on-the-fly iota selection matrices; the serial
    dependency runs as ``block`` statically-indexed (1, 128) updates per
    chunk instead of K masked reductions over (1, K).
    """
    f32 = jnp.float32
    x1r = x1row_ref[0]  # (1, k_pad)
    x2r = x2row_ref[0]
    wr = jnp.maximum(x2r - x1r, 0.0)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, k_pad), 1)
    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    sub_sel = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 0)
    lane_sel = jax.lax.broadcasted_iota(jnp.int32, (k_pad, 128), 1)
    sub_sct = jax.lax.broadcasted_iota(jnp.int32, (128, k_pad), 0)
    lane_sct = jax.lax.broadcasted_iota(jnp.int32, (128, k_pad), 1)

    def chunk(c, alive):
        i0 = c * block
        x1c = x1col_ref[0, pl.ds(i0, block), :]  # (block, 1) sublane slice
        x2c = x2col_ref[0, pl.ds(i0, block), :]
        wc = jnp.maximum(x2c - x1c, 0.0)
        inter = jnp.maximum(
            jnp.minimum(x2c, x2r) - jnp.maximum(x1c, x1r), 0.0
        )  # (block, k_pad)
        iou = inter / jnp.maximum(wc + wr - inter, 1e-12)
        m = (iou > iou_threshold).astype(f32)

        # gather chunk state/bounds into (1, 128) rows: v @ S, with
        # S[r, j] = (r == i0 + j) & (j < block)
        sel = ((sub_sel == i0 + lane_sel) & (lane_sel < block)).astype(f32)
        # 0/1-valued dots (gather/scatter/supp) are exact in the MXU's bf16
        # passes; the *bounds* gathers must run HIGHEST or the bf16 rounding
        # of the interval endpoints flips near-threshold keep decisions
        # (observed on-chip: interpret mode matched, TPU didn't).
        hi = jax.lax.Precision.HIGHEST
        a_c = jnp.dot(alive, sel, preferred_element_type=f32)
        x1c_row = jnp.dot(x1r, sel, precision=hi, preferred_element_type=f32)
        x2c_row = jnp.dot(x2r, sel, precision=hi, preferred_element_type=f32)
        wcr = jnp.maximum(x2c_row - x1c_row, 0.0)
        inter_cc = jnp.maximum(
            jnp.minimum(x2c, x2c_row) - jnp.maximum(x1c, x1c_row), 0.0
        )  # (block, 128); pad lanes are width-0 -> IoU 0
        iou_cc = inter_cc / jnp.maximum(wc + wcr - inter_cc, 1e-12)
        mcc = (iou_cc > iou_threshold).astype(f32)

        for j in range(block):  # static unroll: the only serial dependency
            keep_j = a_c[:, j : j + 1]  # (1, 1)
            row_j = mcc[j : j + 1, :]  # (1, 128)
            a_c = a_c * (1.0 - keep_j * row_j * (lane128 > j).astype(f32))

        # bulk-suppress later columns by every kept row of this chunk
        supp = jnp.dot(a_c[:, :block], m, preferred_element_type=f32)
        supp_gate = ((supp > 0.0) & (col >= i0 + block)).astype(f32)
        # scatter a_c back: v @ S_T, with S_T[j, r] = (r == i0 + j)
        sct = ((lane_sct == i0 + sub_sct)).astype(f32)
        newvals = jnp.dot(a_c, sct, preferred_element_type=f32)
        in_chunk = (col >= i0) & (col < i0 + block)
        return jnp.where(in_chunk, newvals, alive * (1.0 - supp_gate))

    alive = jax.lax.fori_loop(
        0, k_pad // block, chunk, valid_ref[0].astype(f32)
    )
    out_ref[...] = (alive > 0.0)[None]


@functools.partial(jax.jit, static_argnames=("iou_threshold", "block", "interpret"))
def greedy_suppress_pallas_blocked(
    x1_sorted: jax.Array,
    x2_sorted: jax.Array,
    valid: jax.Array,
    iou_threshold: float,
    block: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """(B, K) score-sorted interval bounds + validity -> (B, K) keep flags.

    Round-3 second attempt, built on the blocked formulation
    (``ops.nms._greedy_suppress_blocked``): isolated-XLA it wins 4x but
    end-to-end XLA spills the per-chunk masks to HBM; here every chunk
    intermediate is VMEM/register-resident by construction. Bit-identical
    to ``_greedy_suppress_rows`` (tests + verified on-chip). Reference
    semantics: torchvision ``batched_nms`` keep order, ``inference.py:75-80``.

    Status: measured **2.8 ms** at (32, 630) on v5e vs <0.5 ms for the XLA
    x16-unrolled loop — NOT adopted. The K serial keep-decisions each lower
    to ~3 Mosaic vector ops that round-trip VMEM (~4 us/step); XLA keeps the
    equivalent (B, K) updates in registers across its unrolled loop body.
    A fixpoint matvec variant was analyzed and pencils out worse (per-clip
    grid: ~25 us/clip of mask-build + latency-bound (1,K)x(K,K) matvecs).
    Conclusion recorded in docs/PERFORMANCE.md: serial-greedy NMS at this
    size is loop-overhead-bound, and XLA's fori_loop + fusion already sits
    closer to the floor than Mosaic codegen for sub-ms scalar-ish loops.
    """
    b, k = x1_sorted.shape
    k_pad = _round_up(k, 128)
    pad = ((0, 0), (0, k_pad - k))
    # pad with degenerate [0, 0] intervals: IoU 0 against everything
    x1p = jnp.pad(x1_sorted.astype(jnp.float32), pad)
    x2p = jnp.pad(x2_sorted.astype(jnp.float32), pad)
    vp = jnp.pad(valid, pad)
    kernel = functools.partial(
        _nms_blocked_kernel,
        k_pad=k_pad,
        block=int(block),
        iou_threshold=float(iou_threshold),
    )
    out = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k_pad, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k_pad), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k_pad), jnp.bool_),
        interpret=interpret,
    )(x1p[:, None, :], x2p[:, None, :], x1p[:, :, None], x2p[:, :, None], vp[:, None, :])
    return out[:, 0, :k]
