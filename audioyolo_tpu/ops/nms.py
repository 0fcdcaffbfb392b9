"""Fixed-capacity 1-D interval NMS, fully in-graph.

Replaces ``torchvision.ops.batched_nms`` (reference ``inference.py:75-80``).
The reference lifts (center, width) intervals to pseudo-boxes of height 10;
for equal-height boxes 2-D IoU reduces exactly to 1-D interval IoU, so we
compute it directly. Static shapes throughout: K proposals in, K score-ordered
keep flags out — XLA sees one compiled graph regardless of how many proposals
survive, and batching across clips is a leading axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def interval_iou_matrix(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """Pairwise IoU of intervals. ``x1,x2``: (..., K). Returns (..., K, K)."""
    inter = jnp.maximum(
        jnp.minimum(x2[..., :, None], x2[..., None, :])
        - jnp.maximum(x1[..., :, None], x1[..., None, :]),
        0.0,
    )
    w = jnp.maximum(x2 - x1, 0.0)
    union = w[..., :, None] + w[..., None, :] - inter
    return inter / jnp.maximum(union, 1e-12)


@partial(jax.jit, static_argnames=("iou_threshold",))
def _greedy_suppress(iou: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy NMS over score-sorted proposals, one sequential pass.

    ``iou``: (B, K, K) IoU among proposals already sorted by descending score.
    Returns (B, K) bool keep flags. Matches torchvision semantics: a proposal
    is suppressed iff its IoU with a higher-scored *kept* proposal is strictly
    greater than the threshold.
    """
    b, k, _ = iou.shape
    alive0 = jnp.ones((b, k), dtype=bool)

    def body(i, alive):
        keep_i = alive[:, i]  # (B,)
        row = jax.lax.dynamic_slice_in_dim(iou, i, 1, axis=1)[:, 0, :]  # (B, K)
        suppress = keep_i[:, None] & (row > iou_threshold)
        later = jnp.arange(k)[None, :] > i
        return alive & ~(suppress & later)

    return jax.lax.fori_loop(0, k, body, alive0)


@partial(jax.jit, static_argnames=("iou_threshold",))
def _greedy_suppress_fixpoint(iou: jax.Array, iou_threshold: float) -> jax.Array:
    """Greedy NMS as a parallel fixpoint — exact alternative formulation.

    The greedy solution is the unique fixpoint of
    ``alive[i] = not any(alive[j] and iou[j, i] > t for j < i)``
    (unique by induction over the score order). The map is antitone, so
    iterating it from the all-alive vector alternates between super- and
    sub-solutions and converges in at most longest-suppression-chain steps;
    the while_loop runs until unchanged (and A_K is exact even on a full-depth
    chain), so the result equals the sequential pass bit-for-bit (tested).

    Micro-benched equal to the sequential pass in isolation (~0.04 ms at
    B=32, K=630) but **21% slower end-to-end**: the (B, K, K) float mask and
    per-iteration einsum add ~50 MB of HBM traffic per step that the fused
    sequential loop avoids. Kept as a tested reference/fallback, not the
    default.
    """
    b, k, _ = iou.shape
    earlier = jnp.arange(k)[:, None] < jnp.arange(k)[None, :]  # j strictly before i
    m = ((iou > iou_threshold) & earlier).astype(jnp.float32)  # (B, K, K)
    alive0 = jnp.ones((b, k), dtype=bool)

    def step(alive):
        # fp32 sums of {0,1} up to K are exact, so == 0 is an exact "none"
        s = jnp.einsum("bj,bjk->bk", alive.astype(jnp.float32), m)
        return s == 0.0

    def cond(carry):
        alive, prev, it = carry
        return jnp.logical_and(it < k, jnp.any(alive != prev))

    def body(carry):
        alive, _, it = carry
        return step(alive), alive, it + 1

    alive, _, _ = jax.lax.while_loop(cond, body, (step(alive0), alive0, jnp.asarray(1)))
    return alive


@partial(jax.jit, static_argnames=("iou_threshold", "unroll"))
def _greedy_suppress_rows(
    x1s: jax.Array, x2s: jax.Array, iou_threshold: float, unroll: int = 16
) -> jax.Array:
    """Greedy NMS from score-sorted interval bounds, the production path.

    Profiling the (B=32, K=630) pipeline showed the matrix formulation above
    costs ~1.2 ms: 0.31 ms to materialize the (B, K, K) IoU matrix plus
    0.88 ms of while-loop bookkeeping (630 iterations x ~1.4 us fixed
    overhead each, the body itself being trivial). This version computes each
    row's IoU on the fly from the (B, K) bounds (identical arithmetic ->
    bit-identical keep flags, tested) and unrolls ``unroll`` sequential
    updates per loop iteration to amortize the bookkeeping (swept on-chip:
    unroll 16 best — 8/16/32 give 345k/357k/333k audio-s/s headlines).
    """
    b, k = x1s.shape
    kp = -(-k // unroll) * unroll
    if kp != k:  # pad with degenerate [0, 0] intervals: IoU 0, suppress nothing
        x1s = jnp.pad(x1s, ((0, 0), (0, kp - k)))
        x2s = jnp.pad(x2s, ((0, 0), (0, kp - k)))
    w = jnp.maximum(x2s - x1s, 0.0)
    col = jnp.arange(kp)[None, :]
    alive0 = jnp.ones((b, kp), dtype=bool)

    def sub(alive, i):
        x1i = jax.lax.dynamic_slice_in_dim(x1s, i, 1, axis=1)  # (B, 1)
        x2i = jax.lax.dynamic_slice_in_dim(x2s, i, 1, axis=1)
        wi = jnp.maximum(x2i - x1i, 0.0)
        inter = jnp.maximum(jnp.minimum(x2i, x2s) - jnp.maximum(x1i, x1s), 0.0)
        iou = inter / jnp.maximum(wi + w - inter, 1e-12)
        keep_i = jax.lax.dynamic_slice_in_dim(alive, i, 1, axis=1)  # (B, 1)
        suppress = keep_i & (iou > iou_threshold) & (col > i)
        return alive & ~suppress

    def body(c, alive):
        for j in range(unroll):
            alive = sub(alive, c * unroll + j)
        return alive

    alive = jax.lax.fori_loop(0, kp // unroll, body, alive0)
    return alive[:, :k]


@partial(jax.jit, static_argnames=("iou_threshold", "block"))
def _greedy_suppress_blocked(
    x1s: jax.Array, x2s: jax.Array, iou_threshold: float, block: int = 16
) -> jax.Array:
    """Blocked greedy NMS — same result as :func:`_greedy_suppress_rows`,
    restructured to shrink the serial dependency chain.

    Key observation: the IoU rows depend only on the (constant) bounds, never
    on the evolving ``alive`` state — only the tiny keep-flag decisions are
    inherently sequential. So per chunk of ``block`` rows: (1) compute the
    (B, block, K) IoU mask vectorized, (2) run the serial pass on just the
    (B, block, block) within-chunk part, (3) apply all of the chunk's kept
    rows to later columns in ONE bulk masked update. The x16-unrolled row
    loop issues 640 serial updates on (B, K) buffers; this issues 640 updates
    on (B, block) plus K/block bulk ops. Same greedy semantics as torchvision
    NMS (reference ``inference.py:75-80``), verified bit-identical
    (tests/test_nms_metrics.py).

    Status: NOT the production path. Isolated at (32, 630) on v5e it wins
    (0.450 -> 0.117 ms suppression), but inside the full decode program XLA
    materializes the per-chunk (B, block, K) IoU masks to HBM instead of
    keeping them fused, and the whole decode+NMS segment regresses
    (~1.1 ms total vs the x16-unrolled rows form). Kept as the reference
    formulation for a future VMEM-resident Pallas port, where the chunk
    intermediates stay on-chip by construction. See docs/PERFORMANCE.md.
    """
    b, k = x1s.shape
    kp = -(-k // block) * block
    if kp != k:  # degenerate [0, 0] pad intervals: IoU 0, suppress nothing
        x1s = jnp.pad(x1s, ((0, 0), (0, kp - k)))
        x2s = jnp.pad(x2s, ((0, 0), (0, kp - k)))
    w = jnp.maximum(x2s - x1s, 0.0)
    col = jnp.arange(kp)[None, :]
    jcol = jnp.arange(block)[None, :]
    alive0 = jnp.ones((b, kp), dtype=bool)

    def chunk(c, alive):
        i0 = c * block
        x1c = jax.lax.dynamic_slice_in_dim(x1s, i0, block, axis=1)  # (B, blk)
        x2c = jax.lax.dynamic_slice_in_dim(x2s, i0, block, axis=1)
        wc = jnp.maximum(x2c - x1c, 0.0)
        inter = jnp.maximum(
            jnp.minimum(x2c[..., None], x2s[:, None, :])
            - jnp.maximum(x1c[..., None], x1s[:, None, :]),
            0.0,
        )
        iou = inter / jnp.maximum(wc[..., None] + w[:, None, :] - inter, 1e-12)
        mask = iou > iou_threshold  # (B, blk, K)
        mask_cc = jax.lax.dynamic_slice_in_dim(mask, i0, block, axis=2)

        alive_c = jax.lax.dynamic_slice_in_dim(alive, i0, block, axis=1)

        def sub(j, a):  # serial only within the (B, blk) chunk
            keep_j = jax.lax.dynamic_slice_in_dim(a, j, 1, axis=1)  # (B, 1)
            row = jax.lax.dynamic_slice_in_dim(mask_cc, j, 1, axis=1)[:, 0, :]
            return a & ~(keep_j & row & (jcol > j))

        alive_c = jax.lax.fori_loop(0, block, sub, alive_c)
        # bulk: every later column suppressed by any kept row of this chunk
        supp = jnp.any(alive_c[..., None] & mask, axis=1)  # (B, K)
        alive = alive & ~(supp & (col >= i0 + block))
        return jax.lax.dynamic_update_slice(alive, alive_c, (0, i0))

    alive = jax.lax.fori_loop(0, kp // block, chunk, alive0)
    return alive[:, :k]


@partial(jax.jit, static_argnames=("iou_threshold", "sample_duration"))
def batched_interval_nms(
    preds: jax.Array,
    iou_threshold: float = 0.1,
    conf_threshold: float = 0.2,
    sample_duration: float = 60.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """NMS + confidence filter over combined-scale predictions.

    ``preds``: (B, K, 3+C) raw decoded model output — layout
    ``[objectness_logit, class_logits..., center_sec, width_sec]``
    (reference ``process_model_outputs`` input, ``inference.py:42-64``).

    Returns ``(order, keep, confidence)``:
      - ``order``  (B, K) int32 — proposal indices sorted by descending score;
      - ``keep``   (B, K) bool — survives NMS *and* ``conf > conf_threshold``,
        aligned with ``order``;
      - ``confidence`` (B, K) — ``sigmoid(obj) * max softmax(cls)``, sorted.
    """
    centers = preds[..., -2]
    widths = preds[..., -1]
    x1 = jnp.clip(centers - widths / 2.0, 0.0, sample_duration)
    x2 = jnp.clip(centers + widths / 2.0, 0.0, sample_duration)

    obj = jax.nn.sigmoid(preds[..., 0])
    cls = jax.nn.softmax(preds[..., 1:-2], axis=-1)
    conf = obj * jnp.max(cls, axis=-1)

    # one stable multi-operand sort carries the bounds and ids along with the
    # key — profiling showed argsort + three take_along_axis gathers cost
    # ~0.5 ms at (32, 630); this is one fused sort
    idx = jnp.broadcast_to(
        jnp.arange(conf.shape[-1], dtype=jnp.int32)[None, :], conf.shape
    )
    neg_s, x1_s, x2_s, order = jax.lax.sort(
        (-conf, x1, x2, idx), dimension=-1, num_keys=1, is_stable=True
    )
    conf_s = -neg_s

    keep = _greedy_suppress_rows(x1_s, x2_s, iou_threshold)
    keep = keep & (conf_s > conf_threshold)
    return order, keep, conf_s
