"""Detection loss with in-graph metrics.

Dense re-formulation of the reference objective (``modules/_loss.py:39-228``):
CIoU interval loss on matched (target, cell, anchor) pairs, objectness BCE
against a CIoU-valued target grid, and class loss (multi-label BCE with label
smoothing, or weighted CE), per scale with confidence weights 4/2/1 and final
weighted sum ``box_w*lbox + conf_w*lconf + class_w*lcls``
(``modules/_loss.py:90-99``).

Everything is fixed-shape and mask-based (see assign.py), so the whole loss —
including the 10-field metric dict the reference computes on host with
sklearn/pandas — lives inside the jitted train step.

Documented deviations from the reference (intended-behavior fixes):
- When several candidate pairs write the objectness target of the same
  (batch, cell, anchor), the reference keeps the *last* write in its
  implementation-defined row order (``modules/_loss.py:142-143``); we keep the
  *max* CIoU (deterministic under XLA scatter; collisions are rare and a
  higher-overlap target is the better supervision signal).
- The reference's CIoU alpha term ``v / ((1+e) - iou) + v``
  (``modules/_loss.py:226``) is reproduced verbatim (including its unusual
  operator precedence) because trained checkpoints embed it.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.metrics import masked_classification_metrics
from .assign import assign_targets_to_scale


def compute_ciou(
    pred_cw: jax.Array, target_cw: jax.Array, e: float = 1e-8, h: float = 10.0
) -> jax.Array:
    """CIoU between (center, width) intervals lifted to height-``h`` boxes
    (reference ``modules/_loss.py:193-228``). Broadcasts over leading axes;
    last axis is (center, width). Returns CIoU clipped to min 0."""
    pc, pw = pred_cw[..., 0], pred_cw[..., 1]
    tc, tw = target_cw[..., 0], target_cw[..., 1]

    px1, px2 = pc - pw / 2.0, pc + pw / 2.0
    tx1, tx2 = tc - tw / 2.0, tc + tw / 2.0

    inter_w = jnp.clip(jnp.minimum(px2, tx2) - jnp.maximum(px1, tx1), 0.0)
    inter = inter_w * h  # heights are identical -> inter_h == h
    union = pw * h + tw * h - inter
    iou = inter / (union + e)

    enc_w = jnp.maximum(px2, tx2) - jnp.minimum(px1, tx1)
    c2 = enc_w**2 + h**2 + e
    v = (4.0 / np.pi**2) * (jnp.arctan(tw / h) - jnp.arctan(pw / h)) ** 2
    rho2 = (pc - tc) ** 2
    # Denominator guard: in fp32 a perfect overlap rounds iou to exactly 1.0,
    # making (1+e)-iou == 0 and the reference formula 0/0 = NaN
    # (modules/_loss.py:226 would NaN identically); clamp to e instead.
    a = jax.lax.stop_gradient(v / jnp.maximum((1.0 + e) - iou, e) + v)
    ciou = iou - (rho2 / c2 + a * v)
    return jnp.clip(ciou, 0.0)


def _bce_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Elementwise binary cross-entropy with logits (numerically stable)."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def focal_loss_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 1.5,
) -> jax.Array:
    """Standalone focal BCE (reference ``FocalLoss``, ``modules/_loss.py:9-36``,
    with_logits form): ``alpha * (1 - exp(-bce))**gamma * bce``, elementwise —
    reduce with mean/sum at the call site."""
    bce = _bce_logits(logits, targets)
    pt = jnp.exp(-bce)
    return alpha * (1.0 - pt) ** gamma * bce


def _masked_mean(x: jax.Array, mask: jax.Array, empty_value: float = 0.0) -> jax.Array:
    m = mask.astype(jnp.float32)
    n = jnp.sum(m)
    return jnp.where(n > 0, jnp.sum(x * m) / jnp.maximum(n, 1.0), empty_value)


class AudioDetectionLoss:
    """Callable loss: ``loss(preds, targets) -> (scalar, metrics_dict)``.

    ``preds``: (sm, md, lg) decoded prediction tensors, each (B, G, A, 3+C)
    with layout [objectness_logit, class_logits..., center_sec, width_sec].
    ``targets``: dict with int32 ``classes`` (B, N), f32 ``centers``/``widths``
    (B, N) and bool ``valid`` (B, N) — the fixed-capacity batch form produced
    by the data pipeline.
    """

    def __init__(
        self,
        anchors_dict: Dict[str, List[float]],
        num_classes: int,
        anchor_t: float = 4.0,
        edge_t: float = 0.5,
        sample_duration: float = 60.0,
        box_w: float = 1.0,
        conf_w: float = 1.0,
        class_w: float = 1.0,
        multi_label: bool = False,
        class_weights: Optional[np.ndarray] = None,
        label_smoothing: float = 0.0,
        batch_scale_loss: bool = False,
        alpha: Optional[float] = None,
        gamma: Optional[float] = None,
        ignore_index: int = -100,
    ):
        self.anchors = {k: jnp.asarray(v, jnp.float32) for k, v in anchors_dict.items()}
        self.num_classes = num_classes
        self.anchor_t = float(anchor_t)
        self.edge_t = float(edge_t)
        self.sample_duration = float(sample_duration)
        self.box_w, self.conf_w, self.class_w = float(box_w), float(conf_w), float(class_w)
        self.multi_label = bool(multi_label)
        self.class_weights = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
        self.label_smoothing = float(label_smoothing)
        self.batch_scale_loss = bool(batch_scale_loss)
        self.focal = (alpha is not None) and (gamma is not None)
        self.alpha = alpha
        self.gamma = gamma
        self.ignore_index = int(ignore_index)

    # ---- per-scale -----------------------------------------------------

    def _conf_loss(self, logits: jax.Array, targets: jax.Array, mask: jax.Array) -> jax.Array:
        if not self.focal:
            elem = _bce_logits(logits, targets)
        else:
            elem = focal_loss_with_logits(logits, targets, self.alpha, self.gamma)
        return _masked_mean(elem, mask)

    def scale_loss(
        self, preds: jax.Array, targets: Dict[str, jax.Array], anchors: jax.Array
    ) -> Tuple[Tuple[jax.Array, jax.Array, jax.Array], Dict[str, jax.Array]]:
        b, g, a, _ = preds.shape
        classes, centers, widths, valid = (
            targets["classes"],
            targets["centers"],
            targets["widths"],
            targets["valid"],
        )
        # clip_valid (B,) marks repeat-padded clips in last_batch="pad" mode
        # (data/loader.py): padded rows must not contribute objectness
        # negatives or metrics — the reference's partial final batch contains
        # only real clips (pipeline/_trainer.py:87-118).
        clip_valid = targets.get("clip_valid")
        if clip_valid is None:
            clip_valid = jnp.ones((b,), bool)
        valid = valid & clip_valid[:, None]
        n = classes.shape[1]

        asn = assign_targets_to_scale(
            classes, centers, widths, valid, g, anchors,
            self.anchor_t, self.edge_t, self.sample_duration,
        )
        cell, pair_valid = asn["cell"], asn["pair_valid"]  # (B, N, A, 3)

        bb = jnp.arange(b)[:, None, None, None]
        aa = jnp.arange(a)[None, None, :, None]
        match = preds[bb, cell, aa]  # (B, N, A, 3, 3+C)

        p_cw = match[..., -2:]
        t_cw = jnp.stack([centers, widths], axis=-1)[:, :, None, None, :]
        ciou = compute_ciou(p_cw, jnp.broadcast_to(t_cw, p_cw.shape))  # (B, N, A, 3)

        pv = pair_valid
        n_pairs = jnp.sum(pv.astype(jnp.float32))
        ciou_loss = _masked_mean(1.0 - ciou, pv)

        # objectness target grid: detached CIoU at matched cells, 0 elsewhere
        ciou_d = jax.lax.stop_gradient(ciou)
        t_conf = jnp.zeros((b, g, a), jnp.float32)
        t_conf = t_conf.at[jnp.broadcast_to(bb, cell.shape), cell, jnp.broadcast_to(aa, cell.shape)].max(
            jnp.where(pv, ciou_d, 0.0)
        )
        p_conf = preds[..., 0]
        clip_grid = jnp.broadcast_to(clip_valid[:, None, None], p_conf.shape)
        conf_loss = self._conf_loss(p_conf, t_conf, clip_grid)
        pos_conf = jax.nn.sigmoid(match[..., 0])
        avg_pos_conf = _masked_mean(pos_conf, pv, empty_value=jnp.nan)
        avg_neg_conf = _masked_mean(
            jax.nn.sigmoid(p_conf), (t_conf == 0) & clip_grid, empty_value=jnp.nan
        )

        # class loss over pairs whose target class is not the ignore index
        cls_pv = pv & (classes[:, :, None, None] != self.ignore_index)
        p_cls = match[..., 1 : 1 + self.num_classes]
        t_cls = jnp.clip(classes, 0)[:, :, None, None]  # safe index for gather
        n_cls = jnp.sum(cls_pv.astype(jnp.float32))
        if self.multi_label:
            cn = 0.5 * self.label_smoothing
            cp = 1.0 - cn
            onehot = (
                jnp.arange(self.num_classes)[None, None, None, None, :] == t_cls[..., None]
            )
            t_probs = jnp.where(onehot, cp, cn)
            bce = _bce_logits(p_cls, t_probs)
            class_loss = jnp.where(
                n_cls > 0,
                jnp.sum(bce * cls_pv[..., None]) / jnp.maximum(n_cls * self.num_classes, 1.0),
                jnp.nan,
            )
        else:
            logp = jax.nn.log_softmax(p_cls, axis=-1)
            nll = -jnp.take_along_axis(logp, jnp.broadcast_to(t_cls[..., None], p_cls.shape[:-1] + (1,)), axis=-1)[..., 0]
            if self.class_weights is None:
                w = jnp.ones_like(nll)
            else:
                # torch CrossEntropyLoss(weight=...) normalizes by the summed
                # weights of the selected targets
                w = jnp.broadcast_to(
                    self.class_weights[jnp.clip(classes, 0)][:, :, None, None], nll.shape
                )
            wm = w * cls_pv.astype(jnp.float32)
            class_loss = jnp.where(n_cls > 0, jnp.sum(nll * wm) / jnp.maximum(jnp.sum(wm), 1e-12), jnp.nan)

        # in-graph classification metrics over matched pairs
        pred_labels = jnp.argmax(p_cls, axis=-1).reshape(-1)
        true_labels = jnp.broadcast_to(t_cls, cls_pv.shape).reshape(-1)
        cls_metrics = masked_classification_metrics(
            pred_labels, true_labels, cls_pv.reshape(-1), self.num_classes
        )

        mean_ciou = _masked_mean(ciou_d, pv, empty_value=jnp.nan)
        metrics = {
            "mean_ciou": mean_ciou,
            "conf_loss": conf_loss,
            "avg_pos_conf": avg_pos_conf,
            "avg_neg_conf": avg_neg_conf,
            "class_loss": class_loss,
            **cls_metrics,
        }
        nan_to_zero = lambda x: jnp.where(jnp.isnan(x), 0.0, x)
        losses = (
            jnp.where(n_pairs > 0, ciou_loss, 0.0),
            nan_to_zero(conf_loss),
            nan_to_zero(class_loss),
        )
        return losses, metrics

    # ---- full loss -----------------------------------------------------

    def __call__(
        self,
        preds: Tuple[jax.Array, jax.Array, jax.Array],
        targets: Dict[str, jax.Array],
    ) -> Tuple[jax.Array, Dict[str, jax.Array]]:
        sm, md, lg = preds
        (sm_lbox, sm_lconf, sm_lcls), sm_m = self.scale_loss(sm, targets, self.anchors["sm"])
        (md_lbox, md_lconf, md_lcls), md_m = self.scale_loss(md, targets, self.anchors["md"])
        (lg_lbox, lg_lconf, lg_lcls), lg_m = self.scale_loss(lg, targets, self.anchors["lg"])

        lbox = sm_lbox + md_lbox + lg_lbox
        lconf = sm_lconf * 4.0 + md_lconf * 2.0 + lg_lconf * 1.0
        lcls = sm_lcls + md_lcls + lg_lcls

        batch_scale = float(sm.shape[0]) if self.batch_scale_loss else 1.0
        loss = (self.box_w * lbox + self.conf_w * lconf + self.class_w * lcls) * batch_scale

        metrics = {"aggregate_loss": loss}
        for key in (
            "mean_ciou", "conf_loss", "avg_pos_conf", "avg_neg_conf",
            "class_loss", "accuracy", "f1", "precision", "recall",
        ):
            # pandas-style NaN-skipping mean over the three scales
            vals = jnp.stack([sm_m[key], md_m[key], lg_m[key]])
            metrics[key] = jnp.nanmean(vals)
        return loss, metrics
