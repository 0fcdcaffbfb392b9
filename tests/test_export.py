"""Serving-artifact export (infer/export.py): the serialized StableHLO
program must reproduce the live inference pipeline exactly, for both the
float32 and int16 waveform entries, with usable metadata."""

import copy
import os

import numpy as np
import pytest

from audioyolo_tpu.config import Config
from audioyolo_tpu.infer.export import (
    build_serving_exported,
    load_serving_artifact,
    save_serving_artifact,
)
from audioyolo_tpu.infer.decode import make_inference_fn, unpack_detections
from audioyolo_tpu.models import AudioDetectionModel

from synth import synth_clip

# compile-heavy / multi-process: excluded from the fast tier (-m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def tiny(tmp_path_factory):
    from conftest import TINY_CFG

    cfg = Config(copy.deepcopy(TINY_CFG))
    model = AudioDetectionModel.from_config(cfg, num_classes=2)
    import jax

    x = np.zeros((1, 1, int(cfg.clip_samples)), np.float32)
    variables = jax.jit(lambda r, a: model.init(r, a, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x
    )
    return cfg, model, variables


def _clips(cfg, n, seed):
    dur = float(cfg.sample_duration)
    out = [
        synth_clip(8000, dur, [(0.5, 1.5, "tone"), (2.0, 3.0, "beep")], seed=seed + i)
        for i in range(n)
    ]
    return np.stack(out)[:, None, :].astype(np.float32)


def test_export_roundtrip_matches_live(tiny, tmp_path):
    cfg, model, variables = tiny
    exported = build_serving_exported(
        model, variables, 2, iou_threshold=0.1, conf_threshold=0.05,
        keep_k=16, platforms=("cpu",),
    )
    path = str(tmp_path / "m.aytx")
    save_serving_artifact(
        path, exported, idx2class_map={0: "tone", 1: "beep"},
        sample_duration=cfg.sample_duration, input_sample_rate=8000,
    )
    fn, meta = load_serving_artifact(path)
    assert meta["idx2class_map"] == {0: "tone", 1: "beep"}
    assert meta["input_shape"] == [2, 1, int(cfg.clip_samples)]

    x = _clips(cfg, 2, seed=5)
    dets = fn(x)

    live = make_inference_fn(
        model, variables, iou_threshold=0.1, conf_threshold=0.05,
        keep_k=16, packed=True,
    )
    live_dets = unpack_detections(np.asarray(live(x)))
    for k in dets:
        np.testing.assert_allclose(dets[k], live_dets[k], atol=1e-6, err_msg=k)


def test_export_int16_entry(tiny, tmp_path):
    """PCM16-waveform entry: in-graph dequant must equal feeding the scaled
    float waveform to the float entry."""
    cfg, model, variables = tiny
    xf = _clips(cfg, 1, seed=9)
    xi = np.clip(xf * 32768.0, -32768, 32767).astype(np.int16)

    exp_i = build_serving_exported(
        model, variables, 1, conf_threshold=0.05, keep_k=16,
        input_dtype="int16", platforms=("cpu",),
    )
    p = str(tmp_path / "i16.aytx")
    save_serving_artifact(p, exp_i, idx2class_map={0: "a", 1: "b"},
                          sample_duration=cfg.sample_duration,
                          input_sample_rate=8000)
    fn_i, meta = load_serving_artifact(p)
    assert meta["input_dtype"] == "int16"
    dets_i = fn_i(xi)

    live = make_inference_fn(model, variables, conf_threshold=0.05,
                             keep_k=16, packed=True)
    dets_f = unpack_detections(np.asarray(live(xi.astype(np.float32) / 32768.0)))
    np.testing.assert_allclose(dets_i["center"], dets_f["center"], atol=1e-5)
    np.testing.assert_allclose(dets_i["confidence"], dets_f["confidence"], atol=1e-5)
    assert (dets_i["valid"] == dets_f["valid"]).all()


def test_export_batch_shape_enforced(tiny, tmp_path):
    cfg, model, variables = tiny
    exported = build_serving_exported(
        model, variables, 2, conf_threshold=0.05, keep_k=16, platforms=("cpu",),
    )
    p = str(tmp_path / "b2.aytx")
    save_serving_artifact(p, exported, idx2class_map={0: "a", 1: "b"},
                          sample_duration=cfg.sample_duration,
                          input_sample_rate=8000)
    fn, _ = load_serving_artifact(p)
    with pytest.raises(Exception):
        fn(_clips(cfg, 3, seed=1))  # wrong leading batch dim must not run


def test_export_framed_entry(tiny, tmp_path):
    """Phase-grouped-frames entry: exporting the framed program and feeding
    frame_host output must match the waveform entry's detections."""
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    cfg, model, variables = tiny
    fe = SpectralFrontend(cfg)
    assert fe.fused is not None, "tiny config should be fused-eligible"
    x = _clips(cfg, 2, seed=13)
    framed = fe.frame_host(x[:, 0, :])

    exp = build_serving_exported(
        model, variables, 2, conf_threshold=0.05, keep_k=16,
        framed=True, frame_shape=tuple(framed.shape[1:]), platforms=("cpu",),
    )
    p = str(tmp_path / "fr.aytx")
    save_serving_artifact(p, exp, idx2class_map={0: "a", 1: "b"},
                          sample_duration=cfg.sample_duration,
                          input_sample_rate=8000)
    fn, meta = load_serving_artifact(p)
    assert meta["input_shape"] == [2, *framed.shape[1:]]
    dets_fr = fn(framed)

    live = make_inference_fn(model, variables, conf_threshold=0.05,
                             keep_k=16, packed=True)
    dets_wav = unpack_detections(np.asarray(live(x)))
    assert (dets_fr["valid"] == dets_wav["valid"]).all()
    m = dets_fr["valid"]
    np.testing.assert_allclose(dets_fr["center"][m], dets_wav["center"][m],
                               atol=1e-4)


def test_export_framed_int8_entry(tiny, tmp_path):
    """The framed-int8 (q, scale) tuple entry — the serving headline
    posture's input — must export, round-trip, and match the live
    int8-DFT model's detections exactly (same graph, same input)."""
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    cfg, model, variables = tiny
    raw8 = copy.deepcopy(cfg.to_dict())
    raw8.setdefault("tpu_config", {})["frontend_precision"] = "int8"
    cfg8 = Config(raw8)
    model8 = AudioDetectionModel.from_config(cfg8, num_classes=2)
    fe = SpectralFrontend(cfg8)
    assert fe.fused_int8
    x = _clips(cfg8, 2, seed=29)
    q, scale = fe.frame_host_int8(x[:, 0, :])

    exp = build_serving_exported(
        model8, variables, 2, conf_threshold=0.05, keep_k=16,
        input_dtype="int8", framed=True, frame_shape=tuple(q.shape[1:]),
        platforms=("cpu",),
    )
    p = str(tmp_path / "fi8.aytx")
    save_serving_artifact(p, exp, idx2class_map={0: "a", 1: "b"},
                          sample_duration=cfg8.sample_duration,
                          input_sample_rate=8000)
    fn, meta = load_serving_artifact(p)
    assert meta["input_dtype"] == ["int8", "float32"]
    assert meta["input_shape"] == [[2, *q.shape[1:]], [2]]
    dets = fn((q, scale))

    live = make_inference_fn(model8, variables, conf_threshold=0.05,
                             keep_k=16, packed=True)
    dets_live = unpack_detections(np.asarray(live((q, scale))))
    assert (dets["valid"] == dets_live["valid"]).all()
    m = dets["valid"]
    np.testing.assert_allclose(dets["confidence"][m],
                               dets_live["confidence"][m], atol=1e-5)
    np.testing.assert_allclose(dets["center"][m], dets_live["center"][m],
                               atol=1e-4)


def test_export_int8_requires_framed(tiny):
    cfg, model, variables = tiny
    with pytest.raises(ValueError, match="framed"):
        build_serving_exported(model, variables, 2, input_dtype="int8",
                               platforms=("cpu",))
