"""End-to-end inference: train a tiny detector on synthetic tones, fold the
RepVGG blocks, stream a long file, and check the CSV event rows are
monotonically ordered and RLE-merged (SURVEY.md §4 item 3)."""

import os

import numpy as np
import pandas as pd
import pytest

import jax.numpy as jnp

from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.data.wavio import write_wav
from audioyolo_tpu.infer import evaluate_audio, evaluate_dir, make_inference_fn, rle_merge
from audioyolo_tpu.infer.eval_map import event_average_precision, event_map
from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

from synth import CLASS_FREQS, make_flat_dataset, synth_clip

# compile-heavy / multi-process: excluded from the fast tier (-m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """Train briefly on synthetic data; return (cfg_dict, model, variables, class2idx)."""
    import copy

    from conftest import TINY_CFG
    from audioyolo_tpu.config import Config

    cfg = Config(copy.deepcopy(TINY_CFG))
    root = str(tmp_path_factory.mktemp("train_ds"))
    ann = make_flat_dataset(root, n_files=6, seed=21)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, 2, shuffle=True, seed=0)
    model = AudioDetectionModel.from_config(cfg, num_classes=len(ds.class2idx))
    loss_fn = AudioDetectionLoss(
        cfg.raw["anchors"], len(ds.class2idx), sample_duration=4,
        multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3, anchor_t=5,
    )
    tx = make_optimizer(cfg.raw["train_config"]["optimizer_config"], None, len(loader))
    trainer = TrainerPipeline(model, loss_fn, tx, metrics_path="/tmp/ig", model_path="/tmp/ig")
    state = trainer.create_state(ds[0]["audio"][None])
    # 8 epochs, not 3: the module's cross-posture comparisons (int8-DFT vs
    # float frontend, fold equivalence on real features) need a model whose
    # detections are not marginal — a 3-epoch model's near-threshold events
    # reshuffled with every XLA graph change and kept breaking tolerance
    # tests that were really asserting "same detections, tiny noise"
    for _ in range(8):
        state, _ = trainer.train(state, loader)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    return cfg, model, variables, ds.class2idx


def test_fold_full_model_equivalence(trained):
    cfg, model, variables, class2idx = trained
    x = jnp.asarray(
        synth_clip(8000, 4.0, [(0.5, 1.5, "tone")], seed=3)[None, None, :]
    )
    y_train_form = model.apply(variables, x, train=False, combine_scales=True)
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    y_deploy = deploy.apply(folded, x, train=False, combine_scales=True)
    np.testing.assert_allclose(
        np.asarray(y_train_form), np.asarray(y_deploy), rtol=5e-3, atol=5e-3
    )


def test_multi_inference_matches_single(trained):
    """make_multi_inference_fn (N forward+decode passes fused into one
    dispatch) must return exactly what N make_inference_fn calls return."""
    from audioyolo_tpu.infer.decode import make_multi_inference_fn

    cfg, model, variables, class2idx = trained
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    single = make_inference_fn(deploy, folded, iou_threshold=0.1, conf_threshold=0.05,
                               keep_k=16, packed=True)
    multi = make_multi_inference_fn(deploy, folded, n_batches=3, iou_threshold=0.1,
                                    conf_threshold=0.05, keep_k=16, packed=True)

    batches = [
        jnp.asarray(np.stack([
            synth_clip(8000, 4.0, [(0.5 + 0.3 * j, 1.5 + 0.3 * j, "tone")], seed=10 * i + j)
            for j in range(2)
        ])[:, None, :])
        for i in range(3)
    ]
    outs = multi(batches)
    assert len(outs) == 3
    for b, o in zip(batches, outs):
        np.testing.assert_allclose(np.asarray(single(b)), np.asarray(o), rtol=1e-5, atol=1e-6)


def test_streaming_long_file(trained, tmp_path):
    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}

    # 20 s file = 5 windows of 4 s, alternating tone/beep events
    segs = [(1.0, 2.2, "tone"), (5.0, 6.0, "beep"), (9.3, 10.6, "tone"),
            (13.0, 14.0, "beep"), (17.2, 18.4, "tone")]
    x = synth_clip(8000, 20.0, segs, seed=5)
    path = str(tmp_path / "long.wav")
    write_wav(path, x, 8000)

    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    infer_fn = make_inference_fn(deploy, folded, iou_threshold=0.1, conf_threshold=0.05, keep_k=32)

    out_dir = str(tmp_path / "preds")
    evaluate_audio(
        infer_fn, path, out_dir,
        input_sample_rate=8000, sample_duration=4.0, batch_size=2,
        idx2class_map=idx2class,
    )
    csvs = []
    for root, _, files in os.walk(out_dir):
        csvs += [os.path.join(root, f) for f in files if f.endswith(".csv")]
    assert len(csvs) == 1
    df = pd.read_csv(csvs[0])
    assert list(df.columns) == ["start", "end", "class"]
    if len(df):
        starts = pd.to_timedelta(df["start"]).dt.total_seconds().to_numpy()
        ends = pd.to_timedelta(df["end"]).dt.total_seconds().to_numpy()
        assert (np.diff(starts) >= -1e-6).all(), "rows must be time-ordered"
        assert (ends >= starts - 1e-6).all()
        # RLE merge: no two consecutive rows share a class
        cls = df["class"].tolist()
        assert all(a != b for a, b in zip(cls, cls[1:]))


def test_int8_input_fn_matches_prequantized_float(trained):
    """make_inference_fn(int8_input=True) takes (q, scale) and must equal the
    float fn fed the host-dequantized waveform — the in-graph dequant is the
    same f32 multiply (infer/decode.py)."""
    from audioyolo_tpu.infer import quantize_clips_int8

    cfg, model, variables, class2idx = trained
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    f_float = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=16, packed=True)
    f_int8 = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=16, packed=True,
                               int8_input=True)

    clips = np.stack([
        synth_clip(8000, 4.0, [(0.5 + 0.4 * j, 1.8 + 0.4 * j, "tone")], seed=j)
        for j in range(3)
    ])[:, None, :]
    x16 = np.clip(np.round(clips * 32768.0), -32768, 32767).astype(np.int16)
    q, scale = quantize_clips_int8(x16)
    dequant = q.astype(np.float32) * scale[:, None, None]
    np.testing.assert_allclose(
        np.asarray(f_int8((jnp.asarray(q), jnp.asarray(scale)))),
        np.asarray(f_float(jnp.asarray(dequant))),
        rtol=1e-5, atol=1e-6,
    )


def test_quantize_clips_int8_roundtrip():
    from audioyolo_tpu.infer import quantize_clips_int8

    rng = np.random.default_rng(0)
    x16 = (rng.standard_normal((4, 1, 4000)) * 9000).astype(np.int16)
    x16[0, 0, 7] = -32768  # int16 abs-overflow corner
    x16[2] = 0  # silent (zero-padded) clip must not divide by zero
    q, scale = quantize_clips_int8(x16)
    assert q.dtype == np.int8 and scale.dtype == np.float32
    # round-trip error bounded by half a quantization step, in int16 units
    step = scale * 32768.0
    err = np.abs(q.astype(np.float32) * step[:, None, None] - x16.astype(np.float32))
    assert (err <= step[:, None, None] / 2 + 1e-3).all()
    # float input: scale maps q straight back to the float waveform
    xf = (rng.standard_normal((2, 1, 1000)) * 0.2).astype(np.float32)
    qf, sf = quantize_clips_int8(xf)
    errf = np.abs(qf.astype(np.float32) * sf[:, None, None] - xf)
    assert (errf <= sf[:, None, None] / 2 + 1e-7).all()


def test_streaming_int8_transfer_exact_on_8bit_content(trained, tmp_path):
    """evaluate_audio(transfer='int8') plumbing (chunking, quantization,
    offsets, padding) must be EXACT when the content is exactly int8+scale
    representable: samples are multiples of 258 = 32766/127 with a full-scale
    sample in every 4 s clip, so per-clip scale is 258 (binary-exact f32) and
    q * scale reproduces the int16 path's floats bit-for-bit -> identical
    detection rows. (Real-content detection equivalence at ~48 dB SNR is
    measured on the trained demo model — docs/PERFORMANCE.md.)"""
    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}
    rng = np.random.default_rng(11)
    sr, dur = 8000, 12.0  # 3 exact clips, no partial tail
    x16 = 258 * rng.integers(-127, 128, int(sr * dur)).astype(np.int32)
    for k in range(3):  # force full-scale absmax in every clip
        x16[k * 4 * sr] = 32766
    path = str(tmp_path / "long8.wav")
    write_wav(path, x16.astype(np.float32) / 32768.0, sr)

    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    kwargs = dict(input_sample_rate=sr, sample_duration=4.0, batch_size=2,
                  idx2class_map=idx2class, return_rows=True)
    f16 = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    rows16 = evaluate_audio(f16, path, "", transfer="int16", **kwargs)
    f8 = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32, int8_input=True)
    rows8 = evaluate_audio(f8, path, "", transfer="int8", **kwargs)

    assert len(rows8) == len(rows16)
    for a, b in zip(rows8, rows16):
        assert a["class_idx"] == b["class_idx"]
        np.testing.assert_allclose(
            [a["start"], a["end"], a["confidence"], a["objectness"]],
            [b["start"], b["end"], b["confidence"], b["objectness"]],
            rtol=1e-5, atol=1e-6,
        )

    # unsupported combinations fail loudly, not silently wrong
    with pytest.raises(ValueError):
        evaluate_audio(f8, path, "", transfer="int8", frame_fn=lambda a: a, **kwargs)
    with pytest.raises(ValueError):
        evaluate_audio(f8, path, "", transfer="int4", **kwargs)


def test_evaluate_dir_fanout(trained, tmp_path):
    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}
    adir = tmp_path / "clips"
    adir.mkdir()
    for i in range(3):
        x = synth_clip(8000, 8.0, [(1.0 + i, 2.0 + i, "tone")], seed=i)
        write_wav(str(adir / f"f{i}.wav"), x, 8000)
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    infer_fn = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    out = str(tmp_path / "out")
    n = evaluate_dir(
        infer_fn, str(adir), out, extension="wav", num_concurrency=2, verbose=False,
        input_sample_rate=8000, sample_duration=4.0, batch_size=2, idx2class_map=idx2class,
    )
    assert n == 3
    found = [f for _, _, fs in os.walk(out) for f in fs if f.endswith(".csv")]
    assert len(found) == 3


def test_evaluate_dir_batched_matches_perfile(trained, tmp_path):
    """The cross-file window scheduler must write byte-identical CSVs to the
    per-file streaming path (same compiled math, batches packed across
    files)."""
    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}
    adir = tmp_path / "clips"
    adir.mkdir()
    # uneven durations so file boundaries land mid-batch: 6s, 10s, 7s -> 2+3+2
    # windows of 4 s = 7 windows over batch_size=2 -> 4 batches, 3 of them
    # spanning or splitting files
    for i, dur in enumerate([6.0, 10.0, 7.0]):
        x = synth_clip(8000, dur, [(1.0, 2.0 + i * 0.7, "tone"), (3.5, min(dur - 0.5, 5.0), "beep")], seed=10 + i)
        write_wav(str(adir / f"f{i}.wav"), x, 8000)
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    infer_fn = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    kwargs = dict(input_sample_rate=8000, sample_duration=4.0, batch_size=2,
                  idx2class_map=idx2class, verbose=False)

    out_b = str(tmp_path / "out_batched")
    out_p = str(tmp_path / "out_perfile")
    nb = evaluate_dir(infer_fn, str(adir), out_b, batch_windows=True, **kwargs)
    np_ = evaluate_dir(infer_fn, str(adir), out_p, batch_windows=False, **kwargs)
    assert nb == np_ == 3
    for i in range(3):
        fb = os.path.join(out_b, "clips", f"f{i}_results.csv")
        fp = os.path.join(out_p, "clips", f"f{i}_results.csv")
        with open(fb) as a, open(fp) as b:
            assert a.read() == b.read(), f"f{i} CSVs differ"


def test_evaluate_dir_mixed_rates(trained, tmp_path):
    """Files not at the model input rate must route through the per-file
    path (on-device resample) while native-rate files batch together."""
    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}
    adir = tmp_path / "clips"
    adir.mkdir()
    for i in range(2):
        write_wav(str(adir / f"n{i}.wav"),
                  synth_clip(8000, 6.0, [(1.0, 2.0, "tone")], seed=i), 8000)
    write_wav(str(adir / "other.wav"),
              synth_clip(16000, 6.0, [(1.0, 2.0, "tone")], seed=7), 16000)
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)
    infer_fn = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    out = str(tmp_path / "out")
    n = evaluate_dir(
        infer_fn, str(adir), out, verbose=False,
        input_sample_rate=8000, sample_duration=4.0, batch_size=2,
        idx2class_map=idx2class,
    )
    assert n == 3
    found = [f for _, _, fs in os.walk(out) for f in fs if f.endswith(".csv")]
    assert len(found) == 3


def test_rle_merge_semantics():
    rows = [
        {"start": 0, "end": 1, "class": "a"},
        {"start": 1, "end": 2, "class": "a"},
        {"start": 5, "end": 6, "class": "a"},  # gap, same class -> still merged
        {"start": 6, "end": 7, "class": "b"},
        {"start": 7, "end": 8, "class": "a"},
    ]
    merged = rle_merge(rows)
    assert [m["class"] for m in merged] == ["a", "b", "a"]
    assert merged[0]["end"] == 6


def test_event_map_perfect_and_degraded():
    gt = [("f", 0, 1.0, 2.0), ("f", 0, 5.0, 6.0), ("f", 1, 8.0, 9.0)]
    perfect = [("f", 0, 0.9, 1.0, 2.0), ("f", 0, 0.8, 5.0, 6.0), ("f", 1, 0.7, 8.0, 9.0)]
    m = event_map(perfect, gt, num_classes=2)
    assert m["mAP@0.5"] == pytest.approx(1.0)

    # one false positive with highest confidence drags precision down
    noisy = [("f", 0, 0.99, 20.0, 21.0)] + perfect
    m2 = event_map(noisy, gt, num_classes=2)
    assert m2["mAP@0.5"] < 1.0

    # missing class entirely -> AP 0 for it
    ap1 = event_average_precision(perfect[:2], gt, class_idx=1)
    assert ap1 == 0.0


def test_sharded_inference_matches_single_device(trained):
    """Batch-sharded inference on an 8-device virtual mesh must produce the
    same detections as single-device."""
    import jax.numpy as jnp

    from audioyolo_tpu.parallel import make_mesh

    cfg, model, variables, class2idx = trained
    folded = fold_repvgg(variables)
    deploy = AudioDetectionModel.from_config(cfg, num_classes=len(class2idx), deploy=True)

    rng = np.random.default_rng(3)
    audio = jnp.asarray((rng.standard_normal((8, 1, cfg.clip_samples)) * 0.1).astype(np.float32))

    f1 = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    f8 = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32, mesh=make_mesh(8))
    d1 = {k: np.asarray(v) for k, v in f1(audio).items()}
    d8 = {k: np.asarray(v) for k, v in f8(audio).items()}
    assert (d1["valid"] == d8["valid"]).all()
    np.testing.assert_allclose(d1["confidence"], d8["confidence"], rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(d1["center"], d8["center"], rtol=1e-4, atol=1e-4)


def test_int8_dft_framed_streaming_close(trained, tmp_path):
    """The int8-DFT framed entry (frontend_precision 'int8' +
    SpectralFrontend.frame_host_int8 via evaluate_audio's frame_fn) must
    produce detections close to the float framed path on a trained model —
    the CLI wiring for the gate-passed bench serving posture."""
    import copy

    from audioyolo_tpu.config import Config
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    cfg, model, variables, class2idx = trained
    idx2class = {v: k for k, v in class2idx.items()}
    sr = 8000
    x = np.concatenate([
        synth_clip(sr, 4.0, [(0.5, 3.0, c)], seed=i)
        for i, c in enumerate(list(CLASS_FREQS)[:2] * 2)
    ])
    path = str(tmp_path / "long_i8dft.wav")
    write_wav(path, x.astype(np.float32), sr)

    folded = fold_repvgg(variables)
    nc = len(class2idx)
    kwargs = dict(input_sample_rate=sr, sample_duration=4.0, batch_size=2,
                  idx2class_map=idx2class, return_rows=True)

    deploy = AudioDetectionModel.from_config(cfg, num_classes=nc, deploy=True)
    fe = SpectralFrontend(cfg)
    f_std = make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32)
    rows_f = evaluate_audio(f_std, path, "", frame_fn=fe.frame_host, **kwargs)

    raw8 = copy.deepcopy(cfg.to_dict())
    raw8.setdefault("tpu_config", {})["frontend_precision"] = "int8"
    cfg8 = Config(raw8)
    deploy8 = AudioDetectionModel.from_config(cfg8, num_classes=nc, deploy=True)
    fe8 = SpectralFrontend(cfg8)
    assert fe8.fused_int8
    f_i8 = make_inference_fn(deploy8, folded, 0.1, 0.05, keep_k=32)
    rows_8 = evaluate_audio(f_i8, path, "", frame_fn=fe8.frame_host_int8, **kwargs)

    # Agreement is asserted at the DETECTION-COVERAGE level, not by pairing
    # rows: on this briefly-trained tiny model near-tied NMS proposals flip
    # under ~1e-3 feature noise, splitting one long event into two (or vice
    # versa) — pair matching breaks on such segmentation flips even though
    # the detected time regions agree. Coverage IoU per class is immune to
    # them; the full-scale gate on the trained demo model is the real
    # accuracy arbiter (docs/PERFORMANCE.md: composed posture mAP@0.5
    # 0.9377 vs 0.9461 float).
    assert len(rows_8) > 10

    def coverage(rows, cls):
        ivs = sorted((r["start"], r["end"]) for r in rows if r["class_idx"] == cls)
        merged = []
        for s, e in ivs:
            if merged and s <= merged[-1][1]:
                merged[-1][1] = max(merged[-1][1], e)
            else:
                merged.append([s, e])
        return merged

    def iou(a, b):
        def total(iv):
            return sum(e - s for s, e in iv)

        inter = 0.0
        for s1, e1 in a:
            for s2, e2 in b:
                inter += max(0.0, min(e1, e2) - max(s1, s2))
        union = total(a) + total(b) - inter
        return inter / union if union else 1.0

    for cls in range(nc):
        cov = iou(coverage(rows_f, cls), coverage(rows_8, cls))
        assert cov > 0.75, (cls, cov)

    # confidences must track closely on events that DO pair cleanly
    pairs = []
    for a in rows_8:
        for b in rows_f:
            if (a["class_idx"] == b["class_idx"]
                    and abs(a["start"] - b["start"]) < 0.2
                    and abs(a["end"] - b["end"]) < 0.2):
                pairs.append(abs(a["confidence"] - b["confidence"]))
                break
    assert len(pairs) >= 8, len(pairs)
    assert np.mean(pairs) < 0.03, np.mean(pairs)
