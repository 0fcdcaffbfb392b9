"""Numerical parity on genuine torch-produced checkpoints (BASELINE.md).

``torch_ref.py`` re-creates the reference network (reference state-dict
naming, frontend-free) in torch; these tests ``torch.save`` a real
``state_dict``, run it through the importer, and assert logit parity between
the torch forward and the flax forward on identical spectral features —
closing the loop that synthesized-name tests cannot: every tensor here came
out of ``torch.save``.

The flax model runs with ``branch_act=True`` (the reference applies
LeakyReLU per RepVGG branch in its train-form forward, and its CLI never
folds — ``modules/_common.py:90``, SURVEY.md §3.3)."""

import os

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.models.import_torch import (
    import_torch_state_dict,
    load_torch_checkpoint,
)

from torch_ref import TorchAudioDetectionNetwork, randomize_


def _roundtrip(tmp_path, raw_cfg, num_classes=2, seed=0):
    tmodel = TorchAudioDetectionNetwork(num_classes, raw_cfg)
    randomize_(tmodel, seed=seed)
    tmodel.eval()

    path = os.path.join(str(tmp_path), "ref_ckpt.pth.tar")
    torch.save({"network_params": tmodel.state_dict()}, path)

    fmodel = AudioDetectionModel.from_config(raw_cfg, num_classes=num_classes,
                                             branch_act=True)
    n_mels = raw_cfg["melspectrogram_config"]["n_mels"]
    # n_frames for the tiny config: clip_samples / hop
    dur, sr = raw_cfg["sample_duration"], raw_cfg["new_sample_rate"]
    n_frames = dur * sr // raw_cfg["melspectrogram_config"]["hop_length"]
    feats = jnp.zeros((1, n_mels, n_frames, 2), jnp.float32)
    template = jax.eval_shape(
        lambda: fmodel.init({"params": jax.random.PRNGKey(0)}, features=feats, train=False)
    )
    variables = import_torch_state_dict(load_torch_checkpoint(path), template)
    return tmodel, fmodel, variables, (n_mels, n_frames)


def _compare(tmodel, fmodel, variables, shape, seed=1, atol=1e-4):
    n_mels, n_frames = shape
    rng = np.random.default_rng(seed)
    feats = rng.standard_normal((2, 2, n_mels, n_frames)).astype(np.float32)

    with torch.no_grad():
        t_sm, t_md, t_lg = tmodel(torch.from_numpy(feats))

    f_feats = jnp.asarray(np.transpose(feats, (0, 2, 3, 1)))  # NCHW -> NHWC
    f_sm, f_md, f_lg = fmodel.apply(variables, features=f_feats, train=False)

    for name, t, f in (("sm", t_sm, f_sm), ("md", t_md, f_md), ("lg", t_lg, f_lg)):
        np.testing.assert_allclose(
            np.asarray(f), t.numpy(), rtol=1e-4, atol=atol,
            err_msg=f"{name} scale diverges",
        )


def test_real_checkpoint_parity_resnet_basicblock(tmp_path, tiny_cfg):
    raw = tiny_cfg.to_dict()
    tmodel, fmodel, variables, shape = _roundtrip(tmp_path, raw, seed=3)
    _compare(tmodel, fmodel, variables, shape)


def test_real_checkpoint_parity_resnet_bottleneck(tmp_path, tiny_cfg):
    raw = tiny_cfg.to_dict()
    raw["resnet_config"] = {"block": "Bottleneck"}
    tmodel, fmodel, variables, shape = _roundtrip(tmp_path, raw, seed=4)
    _compare(tmodel, fmodel, variables, shape)


def test_real_checkpoint_parity_custom_backbone(tmp_path, tiny_cfg):
    raw = tiny_cfg.to_dict()
    raw["backbone"] = "custom"
    raw["block_layers"] = [1, 2, 1, 1]  # exercise multi-layer extractor blocks
    tmodel, fmodel, variables, shape = _roundtrip(tmp_path, raw, seed=5)
    _compare(tmodel, fmodel, variables, shape)


def test_branch_act_changes_logits(tmp_path, tiny_cfg):
    """Guard: the reference-exact per-branch activation must actually differ
    from the fold-exact default, otherwise the flag is dead."""
    raw = tiny_cfg.to_dict()
    tmodel, fmodel_ref, variables, shape = _roundtrip(tmp_path, raw, seed=6)
    fmodel_plain = AudioDetectionModel.from_config(raw, num_classes=2, branch_act=False)
    n_mels, n_frames = shape
    feats = jnp.asarray(
        np.random.default_rng(7).standard_normal((1, n_mels, n_frames, 2)).astype(np.float32)
    )
    ref = fmodel_ref.apply(variables, features=feats, train=False, combine_scales=True)
    plain = fmodel_plain.apply(variables, features=feats, train=False, combine_scales=True)
    assert np.abs(np.asarray(ref) - np.asarray(plain)).max() > 1e-3


def _event_parity(tmp_path, raw_cfg, seed, conf_threshold=0.25, iou_threshold=0.1):
    """Event lists (conf, class, start, end) from the reference's
    process_model_outputs (torch_ref.process_model_outputs_ref, a faithful
    re-implementation of ``inference.py:42-110`` with torchvision batched-NMS
    keep order) must match our jitted decode+NMS+compaction row for row, on
    identical decoded predictions through an imported checkpoint."""
    from torch_ref import process_model_outputs_ref
    from audioyolo_tpu.infer.decode import (
        detection_postprocess_graph,
        postprocess_detections,
    )

    tmodel, fmodel, variables, (n_mels, n_frames) = _roundtrip(
        tmp_path, raw_cfg, seed=seed
    )
    rng = np.random.default_rng(seed + 100)
    feats = rng.standard_normal((3, 2, n_mels, n_frames)).astype(np.float32)
    dur = float(raw_cfg["sample_duration"])

    with torch.no_grad():
        t_out = tmodel(torch.from_numpy(feats), combine_scales=True)
    ref_events = process_model_outputs_ref(
        t_out, iou_threshold=iou_threshold, conf_threshold=conf_threshold,
        sample_duration=dur,
    )

    f_feats = jnp.asarray(np.transpose(feats, (0, 2, 3, 1)))
    preds = fmodel.apply(variables, features=f_feats, train=False,
                         combine_scales=True)
    k = preds.shape[1]
    dets = jax.jit(
        lambda p: detection_postprocess_graph(
            p, iou_threshold, conf_threshold, dur, keep_k=k
        )
    )(preds)
    ours = postprocess_detections(
        {kk: np.asarray(v) for kk, v in dets.items()}, dur
    )

    assert sum(len(r) for r in ref_events) > 0, "degenerate test: no events"
    for b, (ref_rows, our_rows) in enumerate(zip(ref_events, ours)):
        assert len(ref_rows) == len(our_rows), (
            f"clip {b}: {len(ref_rows)} reference events vs {len(our_rows)} ours"
        )
        for r, o in zip(ref_rows, our_rows):
            assert o[0] == pytest.approx(r[0], abs=2e-4)  # confidence
            # our pipeline reports sigmoid(obj); reference rows carry the logit
            assert o[1] == pytest.approx(1 / (1 + np.exp(-r[1])), abs=2e-4)
            assert o[2] == r[2]  # class index
            assert o[3] == pytest.approx(r[3], abs=1e-3)  # start
            assert o[4] == pytest.approx(r[4], abs=1e-3)  # end


def test_event_parity_resnet_basicblock(tmp_path, tiny_cfg):
    _event_parity(tmp_path, tiny_cfg.to_dict(), seed=11)


def test_event_parity_resnet_bottleneck(tmp_path, tiny_cfg):
    raw = tiny_cfg.to_dict()
    raw["resnet_config"] = {"block": "Bottleneck"}
    _event_parity(tmp_path, raw, seed=12)


def test_event_parity_custom_backbone(tmp_path, tiny_cfg):
    raw = tiny_cfg.to_dict()
    raw["backbone"] = "custom"
    _event_parity(tmp_path, raw, seed=13)
