"""NMS vs a naive numpy greedy oracle; in-graph metrics vs sklearn."""

import numpy as np
from sklearn.metrics import accuracy_score, f1_score, precision_score, recall_score

import jax.numpy as jnp

from audioyolo_tpu.ops.metrics import masked_classification_metrics
from audioyolo_tpu.ops.nms import batched_interval_nms, interval_iou_matrix


def _naive_nms(x1, x2, scores, thr):
    order = np.argsort(-scores)
    keep = []
    for i in order:
        ok = True
        for j in keep:
            inter = max(0.0, min(x2[i], x2[j]) - max(x1[i], x1[j]))
            union = (x2[i] - x1[i]) + (x2[j] - x1[j]) - inter
            if union > 0 and inter / union > thr:
                ok = False
                break
        if ok:
            keep.append(i)
    return sorted(keep)


def test_iou_matrix(rng):
    x1 = np.array([0.0, 1.0, 5.0])
    x2 = np.array([2.0, 3.0, 6.0])
    iou = np.asarray(interval_iou_matrix(jnp.asarray(x1), jnp.asarray(x2)))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
    assert iou[0, 1] == np.float32(1.0 / 3.0)
    assert iou[0, 2] == 0.0


def test_nms_matches_naive(rng):
    b, k, c = 3, 40, 4
    preds = rng.standard_normal((b, k, 3 + c)).astype(np.float32)
    preds[..., -2] = rng.uniform(0, 60, (b, k))  # centers
    preds[..., -1] = rng.uniform(0.5, 20, (b, k))  # widths
    order, keep, conf = map(
        np.asarray, batched_interval_nms(jnp.asarray(preds), 0.3, 0.0, 60.0)
    )
    for bi in range(b):
        obj = 1 / (1 + np.exp(-preds[bi, :, 0]))
        e = np.exp(preds[bi, :, 1:-2] - preds[bi, :, 1:-2].max(-1, keepdims=True))
        cls = e / e.sum(-1, keepdims=True)
        scores = obj * cls.max(-1)
        x1 = np.clip(preds[bi, :, -2] - preds[bi, :, -1] / 2, 0, 60)
        x2 = np.clip(preds[bi, :, -2] + preds[bi, :, -1] / 2, 0, 60)
        expected = _naive_nms(x1, x2, scores, 0.3)
        got = sorted(order[bi][keep[bi]].tolist())
        assert got == expected


def test_nms_conf_threshold(rng):
    preds = np.zeros((1, 5, 5), np.float32)
    preds[0, :, 0] = [5.0, 4.0, -5.0, -5.0, -5.0]  # two confident proposals
    preds[0, :, -2] = [10, 30, 40, 50, 55]
    preds[0, :, -1] = 2.0
    # uniform class softmax halves the confidence: conf = sigmoid(obj) * 0.5
    order, keep, conf = map(np.asarray, batched_interval_nms(jnp.asarray(preds), 0.1, 0.4, 60.0))
    kept = order[0][keep[0]]
    assert set(kept.tolist()) == {0, 1}


def test_metrics_match_sklearn(rng):
    n, c = 200, 5
    true = rng.integers(0, c, n)
    pred = rng.integers(0, c, n)
    mask = rng.random(n) > 0.3
    out = masked_classification_metrics(
        jnp.asarray(pred), jnp.asarray(true), jnp.asarray(mask), c
    )
    t, p = true[mask], pred[mask]
    np.testing.assert_allclose(float(out["accuracy"]), accuracy_score(t, p), atol=1e-6)
    np.testing.assert_allclose(float(out["f1"]), f1_score(t, p, average="macro"), atol=1e-6)
    np.testing.assert_allclose(
        float(out["precision"]), precision_score(t, p, average="macro", zero_division=0), atol=1e-6
    )
    np.testing.assert_allclose(
        float(out["recall"]), recall_score(t, p, average="macro", zero_division=0), atol=1e-6
    )


def test_metrics_missing_class(rng):
    # class 3 never appears in targets or predictions -> excluded from macro
    true = np.array([0, 0, 1, 2, 2])
    pred = np.array([0, 1, 1, 2, 0])
    mask = np.ones(5, bool)
    out = masked_classification_metrics(jnp.asarray(pred), jnp.asarray(true), jnp.asarray(mask), 4)
    np.testing.assert_allclose(float(out["f1"]), f1_score(true, pred, average="macro"), atol=1e-6)


def test_metrics_empty_mask():
    out = masked_classification_metrics(
        jnp.zeros(4, jnp.int32), jnp.zeros(4, jnp.int32), jnp.zeros(4, bool), 3
    )
    assert np.isnan(float(out["accuracy"]))


def test_pallas_nms_matches_xla_interpret(rng):
    """The experimental Pallas NMS kernel (interpret mode on CPU) must agree
    with the XLA greedy suppression bit-for-bit."""
    import jax.numpy as jnp

    from audioyolo_tpu.ops.nms import _greedy_suppress
    from audioyolo_tpu.ops.pallas_nms import greedy_suppress_pallas

    b, k = 3, 50
    c = rng.uniform(0, 60, (b, k)).astype(np.float32)
    w = rng.uniform(0.5, 20, (b, k)).astype(np.float32)
    x1 = jnp.asarray(np.clip(c - w / 2, 0, 60))
    x2 = jnp.asarray(np.clip(c + w / 2, 0, 60))
    valid = jnp.ones((b, k), bool)
    kp = greedy_suppress_pallas(x1, x2, valid, 0.3, interpret=True)
    kx = _greedy_suppress(interval_iou_matrix(x1, x2), 0.3)
    assert (np.asarray(kp) == np.asarray(kx)).all()


def test_pallas_blocked_nms_matches_xla_interpret(rng):
    """The round-3 blocked Pallas NMS kernel (interpret mode) must agree with
    the production suppression bit-for-bit, including at K=630 (pad path)."""
    import jax.numpy as jnp

    from audioyolo_tpu.ops.nms import _greedy_suppress_rows
    from audioyolo_tpu.ops.pallas_nms import greedy_suppress_pallas_blocked

    for b, k in ((2, 630), (3, 100)):
        c = rng.uniform(0, 60, (b, k)).astype(np.float32)
        w = rng.uniform(0.2, 20, (b, k)).astype(np.float32)
        x1 = jnp.asarray(np.clip(c - w / 2, 0, 60))
        x2 = jnp.asarray(np.clip(c + w / 2, 0, 60))
        valid = jnp.ones((b, k), bool)
        for t in (0.1, 0.45):
            kp = greedy_suppress_pallas_blocked(x1, x2, valid, t, interpret=True)
            kx = _greedy_suppress_rows(x1, x2, t)
            assert (np.asarray(kp) == np.asarray(kx)).all()


def test_fixpoint_suppress_equals_sequential(rng):
    """The parallel fixpoint greedy NMS must match the K-step sequential pass
    bit-for-bit, including adversarial long suppression chains."""
    from audioyolo_tpu.ops.nms import (_greedy_suppress, _greedy_suppress_blocked,
                                       _greedy_suppress_fixpoint,
                                       _greedy_suppress_rows)

    # random interval soups (k=63: not a multiple of the block size, so the
    # blocked formulation's pad path is exercised too)
    for trial in range(3):
        k = 64 if trial < 2 else 63
        c = rng.uniform(0, 60, (4, k)).astype(np.float32)
        w = rng.uniform(0.5, 20, (4, k)).astype(np.float32)
        x1, x2 = c - w / 2, c + w / 2
        iou = interval_iou_matrix(jnp.asarray(x1), jnp.asarray(x2))
        for t in (0.1, 0.45):
            a = np.asarray(_greedy_suppress(iou, t))
            b = np.asarray(_greedy_suppress_fixpoint(iou, t))
            np.testing.assert_array_equal(a, b)
            c = np.asarray(_greedy_suppress_rows(jnp.asarray(x1), jnp.asarray(x2), t))
            np.testing.assert_array_equal(a, c)
            d = np.asarray(_greedy_suppress_blocked(jnp.asarray(x1), jnp.asarray(x2), t))
            np.testing.assert_array_equal(a, d)

    # adversarial chain: each interval overlaps only its neighbor, so greedy
    # keeps the evens — maximal suppression-dependency depth
    k = 63
    x1 = np.arange(k, dtype=np.float32)[None, :] * 0.6
    x2 = x1 + 1.0
    iou = interval_iou_matrix(jnp.asarray(x1), jnp.asarray(x2))
    a = np.asarray(_greedy_suppress(iou, 0.2))[0]
    b = np.asarray(_greedy_suppress_fixpoint(iou, 0.2))[0]
    np.testing.assert_array_equal(a, b)
    c = np.asarray(_greedy_suppress_rows(jnp.asarray(x1), jnp.asarray(x2), 0.2))[0]
    np.testing.assert_array_equal(a, c)
    d = np.asarray(_greedy_suppress_blocked(jnp.asarray(x1), jnp.asarray(x2), 0.2))[0]
    np.testing.assert_array_equal(a, d)
    assert a[::2].all() and not a[1::2].any()
