"""Assignment semantics vs a naive Python enumerator + loss sanity/grad tests."""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioyolo_tpu.train.assign import assign_targets_to_scale
from audioyolo_tpu.train.loss import AudioDetectionLoss, compute_ciou


def _naive_pairs(targets, grid, anchors, anchor_t, edge_t, dur):
    """Enumerate (target_idx, anchor_idx, cell) triples per the documented
    reference semantics (dataset.py:286-365), written as plain loops."""
    out = set()
    for ti, (cls, c, w) in enumerate(targets):
        gc = (c / dur) * grid
        gi = grid - gc
        for ai, a in enumerate(anchors):
            r = w / a
            if max(r, 1 / r) >= anchor_t:
                continue
            cells = [int(gc)]  # trunc
            if (gc % 1) < edge_t and gc > 1:
                cells.append(int(gc - edge_t))
            if (gi % 1) < edge_t and gi > 1:
                cells.append(int(gc + edge_t))
            for cell in cells:
                out.add((ti, ai, min(max(cell, 0), grid - 1)))
    return out


def _dense_pairs(classes, centers, widths, valid, grid, anchors, anchor_t, edge_t, dur):
    asn = assign_targets_to_scale(
        jnp.asarray(classes)[None], jnp.asarray(centers)[None], jnp.asarray(widths)[None],
        jnp.asarray(valid)[None], grid, jnp.asarray(anchors), anchor_t, edge_t, dur,
    )
    cell = np.asarray(asn["cell"])[0]
    pv = np.asarray(asn["pair_valid"])[0]
    got = set()
    for ti in range(cell.shape[0]):
        for ai in range(cell.shape[1]):
            for oi in range(3):
                if pv[ti, ai, oi]:
                    got.add((ti, ai, int(cell[ti, ai, oi])))
    return got


def test_worked_example_from_reference_comment():
    # center 40.89 s, width 10 s, 60 s clip, 120-cell grid -> cells 81 and 82
    # (dataset.py:344-349)
    classes = np.array([0], np.int32)
    centers = np.array([40.89], np.float32)
    widths = np.array([10.0], np.float32)
    valid = np.array([True])
    anchors = [10.0]
    got = _dense_pairs(classes, centers, widths, valid, 120, anchors, 4.0, 0.5, 60.0)
    assert got == {(0, 0, 81), (0, 0, 82)}


def test_assignment_matches_naive_enumeration(rng):
    dur, grid = 60.0, 120
    anchors = [2.65, 7.44, 12.87]
    n = 12
    classes = rng.integers(0, 3, n).astype(np.int32)
    centers = rng.uniform(0, dur, n).astype(np.float32)
    widths = rng.uniform(0.3, 40.0, n).astype(np.float32)
    valid = rng.random(n) > 0.25

    naive = _naive_pairs(
        [(classes[i], float(centers[i]), float(widths[i])) for i in range(n) if valid[i]],
        grid, anchors, 5.0, 0.5, dur,
    )
    # remap: naive indexes only valid targets; rebuild with original slots
    naive_full = set()
    vi = -1
    vmap = {}
    for i in range(n):
        if valid[i]:
            vi += 1
            vmap[vi] = i
    naive_full = {(vmap[t], a, c) for (t, a, c) in naive}

    got = _dense_pairs(classes, centers, widths, valid, grid, anchors, 5.0, 0.5, dur)
    assert got == naive_full


def test_assignment_edges():
    # center exactly at duration -> cell clipped to G-1; center 0 -> cell 0
    classes = np.array([0, 0], np.int32)
    centers = np.array([60.0, 0.0], np.float32)
    widths = np.array([5.0, 5.0], np.float32)
    valid = np.array([True, True])
    got = _dense_pairs(classes, centers, widths, valid, 120, [5.0], 4.0, 0.5, 60.0)
    cells_t0 = {c for (t, a, c) in got if t == 0}
    cells_t1 = {c for (t, a, c) in got if t == 1}
    assert 119 in cells_t0
    assert 0 in cells_t1


def test_ciou_hand_computed():
    # identical intervals -> IoU 1, rho2 0, v 0 => CIoU ~ 1
    p = jnp.asarray([[10.0, 4.0]])
    t = jnp.asarray([[10.0, 4.0]])
    assert float(compute_ciou(p, t)[0]) == pytest.approx(1.0, abs=1e-5)

    # disjoint far intervals -> clipped to 0
    t2 = jnp.asarray([[50.0, 4.0]])
    assert float(compute_ciou(p, t2)[0]) == 0.0

    # partial overlap, hand-computed: p=[8,12], t=[10,14] widths 4, h=10
    p3 = jnp.asarray([[10.0, 4.0]])
    t3 = jnp.asarray([[12.0, 4.0]])
    e = 1e-8
    inter = 2.0 * 10
    union = 40.0 + 40.0 - inter
    iou = inter / (union + e)
    enc = 6.0
    c2 = enc**2 + 100 + e
    v = (4 / math.pi**2) * (math.atan(0.4) - math.atan(0.4)) ** 2  # 0
    expected = iou - ((4.0 / c2) + 0.0)
    assert float(compute_ciou(p3, t3)[0]) == pytest.approx(expected, abs=1e-5)


def _toy_batch(num_classes=2, b=2, n=4):
    rng = np.random.default_rng(7)
    return {
        "classes": rng.integers(0, num_classes, (b, n)).astype(np.int32),
        "centers": rng.uniform(5, 55, (b, n)).astype(np.float32),
        "widths": rng.uniform(1, 30, (b, n)).astype(np.float32),
        "valid": np.ones((b, n), bool),
    }


def _toy_preds(num_classes=2, b=2, seed=0):
    rng = np.random.default_rng(seed)

    def mk(g):
        p = rng.standard_normal((b, g, 3, 3 + num_classes)).astype(np.float32)
        p[..., -2] = rng.uniform(0, 60, (b, g, 3))
        p[..., -1] = rng.uniform(0.5, 50, (b, g, 3))
        return jnp.asarray(p)

    return mk(120), mk(60), mk(30)


ANCHORS = {"sm": [2.65, 7.44, 12.87], "md": [19.55, 27.2, 35.18], "lg": [43.19, 51.0, 59.82]}


def test_loss_finite_and_metrics_complete():
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, anchor_t=5, multi_label=True, label_smoothing=0.08)
    targets = {k: jnp.asarray(v) for k, v in _toy_batch().items()}
    loss, metrics = loss_fn(_toy_preds(), targets)
    assert np.isfinite(float(loss))
    for k in ("aggregate_loss", "mean_ciou", "conf_loss", "avg_pos_conf",
              "avg_neg_conf", "class_loss", "accuracy", "f1", "precision", "recall"):
        assert k in metrics
    assert 0.0 <= float(metrics["mean_ciou"]) <= 1.0


def test_loss_no_valid_targets_is_zero_boxcls():
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, multi_label=True)
    batch = _toy_batch()
    batch["valid"][:] = False
    targets = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, metrics = loss_fn(_toy_preds(), targets)
    # only the (all-negative) conf loss contributes; box/class collapse to 0
    assert np.isfinite(float(loss))
    assert np.isnan(float(metrics["mean_ciou"]))
    assert np.isnan(float(metrics["accuracy"]))


def test_loss_ignore_index_excluded_from_class_loss():
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, multi_label=True)
    batch = _toy_batch()
    batch["classes"][:] = -100  # all pad labels: box/conf supervised, class not
    targets = {k: jnp.asarray(v) for k, v in batch.items()}
    loss, metrics = loss_fn(_toy_preds(), targets)
    assert np.isfinite(float(loss))
    assert np.isnan(float(metrics["class_loss"]))
    assert not np.isnan(float(metrics["mean_ciou"]))


def test_loss_single_label_class_weights():
    w = np.array([1.0, 3.0], np.float32)
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, multi_label=False, class_weights=w)
    targets = {k: jnp.asarray(v) for k, v in _toy_batch().items()}
    loss, metrics = loss_fn(_toy_preds(), targets)
    assert np.isfinite(float(loss))


def test_loss_gradients_flow():
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, multi_label=True, box_w=0.1, class_w=0.3)
    targets = {k: jnp.asarray(v) for k, v in _toy_batch().items()}
    preds = _toy_preds()

    def f(preds):
        return loss_fn(preds, targets)[0]

    grads = jax.grad(f)(preds)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
        assert float(jnp.abs(g).sum()) > 0


def test_focal_conf_loss():
    loss_fn = AudioDetectionLoss(ANCHORS, num_classes=2, multi_label=True, alpha=0.25, gamma=1.5)
    targets = {k: jnp.asarray(v) for k, v in _toy_batch().items()}
    loss, _ = loss_fn(_toy_preds(), targets)
    assert np.isfinite(float(loss))


def test_focal_loss_standalone_matches_formula():
    from audioyolo_tpu.train import focal_loss_with_logits

    logits = jnp.asarray([-2.0, 0.0, 3.0])
    targets = jnp.asarray([0.0, 1.0, 1.0])
    alpha, gamma = 0.25, 1.5
    bce = np.maximum(logits, 0) - logits * targets + np.log1p(np.exp(-np.abs(logits)))
    expected = alpha * (1 - np.exp(-bce)) ** gamma * bce
    np.testing.assert_allclose(
        np.asarray(focal_loss_with_logits(logits, targets, alpha, gamma)),
        np.asarray(expected), rtol=1e-5,
    )
