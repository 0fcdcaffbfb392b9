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
    """Greedy NMS over score-sorted proposals.

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

    order = jnp.argsort(-conf, axis=-1)
    conf_s = jnp.take_along_axis(conf, order, axis=-1)
    x1_s = jnp.take_along_axis(x1, order, axis=-1)
    x2_s = jnp.take_along_axis(x2, order, axis=-1)

    iou = interval_iou_matrix(x1_s, x2_s)
    keep = _greedy_suppress(iou, iou_threshold)
    keep = keep & (conf_s > conf_threshold)
    return order, keep, conf_s
