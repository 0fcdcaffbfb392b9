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
