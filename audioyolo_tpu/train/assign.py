"""Static-shape YOLO target assignment.

Re-expresses the reference's mask-and-repeat assignment
(``dataset.py:286-365``) as a dense, fixed-capacity computation: instead of
producing a variable number of (target, cell, anchor) rows, every
``(batch, target_slot, anchor, offset)`` combination is materialized as one
candidate pair with a validity flag. XLA therefore sees one static shape
``(B, N, A, 3)`` regardless of how many targets a clip has — the single most
important idiomatic transformation for TPU (SURVEY.md §7).

Semantics preserved exactly:
- anchor gate: ``max(w/a, a/w) < anchor_t`` (``dataset.py:313-314``);
- fractional cell ``grid_c = center/duration * G``; duplicate into the left
  neighbor when ``grid_c % 1 < edge_t`` and ``grid_c > 1``, and into the right
  neighbor when ``grid_i % 1 < edge_t`` and ``grid_i > 1`` with
  ``grid_i = G - grid_c`` (``:323-335``);
- cell index ``int(grid_c + offset*edge_t)`` truncated then clipped to
  ``[0, G-1]`` (``:354-362``) — offsets are 0 / -edge_t / +edge_t.

The reference's worked example (``dataset.py:344-349``) — center 40.89 s,
duration 60 s, G=120 → cells 81 and 82 — is a unit-test vector.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp


def assign_targets_to_scale(
    classes: jax.Array,
    centers: jax.Array,
    widths: jax.Array,
    valid: jax.Array,
    grid_size: int,
    anchors: jax.Array,
    anchor_threshold: float = 4.0,
    edge_threshold: float = 0.5,
    sample_duration: float = 60.0,
) -> Dict[str, jax.Array]:
    """Build dense candidate pairs for one detection scale.

    Args:
      classes: (B, N) int32 — class index per target slot (ignore_index rows
        allowed: they still take part in box/conf supervision).
      centers, widths: (B, N) f32 — interval center/width in seconds.
      valid: (B, N) bool — slot occupancy mask.
      grid_size: G cells at this scale.
      anchors: (A,) f32 — anchor widths in seconds (static config anchors; the
        reference's loss also assigns with config anchors, not the learned
        ones — train.py:76).

    Returns dict of (B, N, A, 3)-shaped arrays (last axis = offset slot
    {center, left, right}):
      ``cell``  int32 — grid cell index;
      ``pair_valid`` bool — candidate is live;
    plus broadcast helpers ``anchor_idx`` (A,) and per-pair target data are
    recoverable by indexing the inputs with ``[:, :, None, None]``.
    """
    b, n = classes.shape
    a = anchors.shape[0]

    w = widths[:, :, None]  # (B, N, 1)
    ratio = w / anchors[None, None, :]
    ratio_ok = jnp.maximum(ratio, 1.0 / ratio) < anchor_threshold  # (B, N, A)

    grid_c = (centers / sample_duration) * grid_size  # (B, N)
    grid_i = grid_size - grid_c
    c_mask = (jnp.mod(grid_c, 1.0) < edge_threshold) & (grid_c > 1.0)
    i_mask = (jnp.mod(grid_i, 1.0) < edge_threshold) & (grid_i > 1.0)

    # offset slots: 0 -> same cell (always), 1 -> left neighbor, 2 -> right.
    offset_ok = jnp.stack([jnp.ones_like(c_mask), c_mask, i_mask], axis=-1)  # (B, N, 3)
    offsets = jnp.asarray([0.0, -edge_threshold, edge_threshold], jnp.float32)

    pair_valid = (
        valid[:, :, None, None] & ratio_ok[:, :, :, None] & offset_ok[:, :, None, :]
    )  # (B, N, A, 3)

    cell_f = grid_c[:, :, None, None] + offsets[None, None, None, :]
    # trunc-toward-zero like torch ``.long()`` (cell_f >= 0 whenever the
    # offset slot is live, so trunc == floor on live pairs), then clip.
    cell = jnp.clip(cell_f.astype(jnp.int32), 0, grid_size - 1)
    cell = jnp.broadcast_to(cell, (b, n, a, 3))

    return {"cell": cell, "pair_valid": pair_valid}
