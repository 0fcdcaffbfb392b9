"""In-graph classification metrics.

The reference computes per-batch accuracy / macro precision / recall / F1 with
sklearn on host (``modules/_loss.py:167-173``), forcing a device->CPU sync every
step. Here the same quantities are computed with fixed-shape jnp reductions so
they live inside the jitted train step and sync at most once per logging
interval.

Macro averaging follows sklearn's default label set: the mean is taken over
classes that appear in the targets or the predictions (zero_division=0).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def masked_classification_metrics(
    pred_labels: jax.Array,
    true_labels: jax.Array,
    mask: jax.Array,
    num_classes: int,
) -> Dict[str, jax.Array]:
    """``pred_labels``/``true_labels``: int (N,) flat; ``mask``: bool (N,).

    Returns accuracy and macro precision/recall/f1 as f32 scalars. All-masked
    input yields NaN metrics, mirroring the reference's empty-batch branch
    (``modules/_loss.py:174-175``).
    """
    m = mask.astype(jnp.float32)
    total = jnp.sum(m)

    classes = jnp.arange(num_classes)
    pred_oh = (pred_labels[:, None] == classes[None, :]).astype(jnp.float32) * m[:, None]
    true_oh = (true_labels[:, None] == classes[None, :]).astype(jnp.float32) * m[:, None]

    tp = jnp.sum(pred_oh * true_oh, axis=0)
    pred_count = jnp.sum(pred_oh, axis=0)
    true_count = jnp.sum(true_oh, axis=0)
    fp = pred_count - tp
    fn = true_count - tp

    present = ((pred_count + true_count) > 0).astype(jnp.float32)
    n_present = jnp.maximum(jnp.sum(present), 1.0)

    precision_c = jnp.where(tp + fp > 0, tp / jnp.maximum(tp + fp, 1e-12), 0.0)
    recall_c = jnp.where(tp + fn > 0, tp / jnp.maximum(tp + fn, 1e-12), 0.0)
    f1_c = jnp.where(
        precision_c + recall_c > 0,
        2.0 * precision_c * recall_c / jnp.maximum(precision_c + recall_c, 1e-12),
        0.0,
    )

    nan = jnp.float32(jnp.nan)
    empty = total == 0
    accuracy = jnp.where(
        empty, nan, jnp.sum((pred_labels == true_labels).astype(jnp.float32) * m) / jnp.maximum(total, 1.0)
    )
    precision = jnp.where(empty, nan, jnp.sum(precision_c * present) / n_present)
    recall = jnp.where(empty, nan, jnp.sum(recall_c * present) / n_present)
    f1 = jnp.where(empty, nan, jnp.sum(f1_c * present) / n_present)
    return {"accuracy": accuracy, "precision": precision, "recall": recall, "f1": f1}
