"""Fused resample+frame+DFT path (ops/fused_frontend.py) vs the standard
frontend: the phase-grouped GEMM formulation must reproduce the sequential
resample -> frame -> window -> DFT chain.

Mel power agrees to ~1e-6 relative. The MFCC *image* channel additionally
passes through the reference's double-dB quirk (log10 of signed cepstra,
modules/_architecture.py:100-101), which is discontinuous at cepstral
zero-crossings — so a handful of near-zero pixels may legitimately flip;
the tests bound that fraction instead of demanding exact agreement there."""

import numpy as np
import pytest

import jax.numpy as jnp

from audioyolo_tpu.config import Config, load_config
from audioyolo_tpu.ops.frontend import SpectralFrontend


@pytest.fixture(scope="module")
def full_cfg():
    return load_config("config/config.yaml")


def _compare_images(fe, wav):
    ref = np.asarray(fe(jnp.asarray(wav)))
    framed = fe.frame_host(wav)
    fused = np.asarray(fe(jnp.asarray(framed)))
    assert fused.shape == ref.shape
    # mel channel: strict
    np.testing.assert_allclose(fused[..., 0], ref[..., 0], atol=1e-4, rtol=1e-4)
    # mfcc channel: strict away from the double-dB discontinuity
    d = np.abs(fused[..., 1] - ref[..., 1])
    frac_loose = (d > 1e-3).mean()
    assert frac_loose < 2e-3, (d.max(), frac_loose)
    return framed


def test_fused_matches_standard_resampled(full_cfg):
    """Shipped config: 22 050 -> 16 000 resample, 8 phases, frame_len 1782."""
    fe = SpectralFrontend(full_cfg)
    assert fe.fused is not None
    assert fe.fused.n_ph == 8
    assert fe.fused.span == 11025
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal((2, full_cfg.clip_samples)) * 0.1).astype(np.float32)
    framed = _compare_images(fe, wav)
    assert framed.shape == (2, 8, 120, fe.fused.frame_len)

    # device framing must equal host framing sample-for-sample
    fd = np.asarray(fe.fused.frame_device(jnp.asarray(wav)))
    np.testing.assert_array_equal(fd, framed)


def test_pallas_mel_kernel_matches_xla(full_cfg):
    """The Pallas DFT+power+mel kernel (ops/pallas_frontend.py, opt-in — a
    measured-negative perf experiment kept for documentation) must agree with
    the XLA default-precision GEMM pair. Runs in interpret mode on CPU; bf16
    rounding in the kernel vs fp32 XLA here bounds agreement at ~1%."""
    import jax

    from audioyolo_tpu.ops.pallas_frontend import PallasMelFrontend

    fe = SpectralFrontend(full_cfg)
    assert fe.fused is not None
    pm = PallasMelFrontend(fe.fused, fe.mel.mel_fb_np)
    assert pm.ok
    rng = np.random.default_rng(3)
    wav = (rng.standard_normal((2, full_cfg.clip_samples)) * 0.1).astype(np.float32)
    framed = fe.frame_host(wav)

    ref = np.asarray(
        jnp.matmul(
            fe.fused(jnp.asarray(framed), power=2.0, reorder=False,
                     precision=jax.lax.Precision.HIGHEST),
            fe.mel.mel_fb,
        )
    )
    out = np.asarray(pm(jnp.asarray(framed), interpret=True))
    assert out.shape == ref.shape
    rel = np.abs(out - ref) / (np.abs(ref) + 1e-3)
    assert rel.max() < 2e-2, rel.max()

    # int16 frames: dequant scale folded into the combined matrix
    i16 = fe.frame_host(
        np.clip(np.round(wav * 32768.0), -32768, 32767).astype(np.int16)
    )
    out16 = np.asarray(pm(jnp.asarray(i16), interpret=True))
    rel16 = np.abs(out16 - ref) / (np.abs(ref) + 1e-3)
    assert rel16.max() < 2e-2, rel16.max()


def test_fused_matches_standard_no_resample(tiny_cfg):
    """No-resample config collapses to a single phase (plain framing)."""
    fe = SpectralFrontend(tiny_cfg)
    assert fe.fused is not None
    assert fe.fused.n_ph == 1
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, tiny_cfg.clip_samples)) * 0.1).astype(np.float32)
    _compare_images(fe, wav)


def test_fused_int16_dequantizes(full_cfg):
    fe = SpectralFrontend(full_cfg)
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((1, full_cfg.clip_samples)) * 0.1).astype(np.float32)
    wav16 = np.clip(np.round(wav * 32768), -32768, 32767).astype(np.int16)
    ref = np.asarray(fe(jnp.asarray(wav16)))
    framed16 = fe.frame_host(wav16)
    assert framed16.dtype == np.int16  # framing preserves the transfer dtype
    fused = np.asarray(fe(jnp.asarray(framed16)))
    np.testing.assert_allclose(fused[..., 0], ref[..., 0], atol=1e-4, rtol=1e-4)


def test_framed_loader_and_model_forward(tmp_path, tiny_cfg):
    """Loader-side framing feeds the model directly: forward on framed input
    must match forward on the waveform, and a short framed training run must
    execute with finite loss."""
    import sys

    sys.path.insert(0, "tests")
    import jax
    from synth import make_flat_dataset
    from audioyolo_tpu.data.dataset import AudioDataset
    from audioyolo_tpu.data.loader import BatchLoader
    from audioyolo_tpu.models import AudioDetectionModel
    from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

    fe = SpectralFrontend(tiny_cfg)
    root = str(tmp_path / "ds")
    ann = make_flat_dataset(root, n_files=4, seed=13)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    nc = len(ds.class2idx)
    model = AudioDetectionModel.from_config(tiny_cfg, num_classes=nc)

    wav = ds[0]["audio"][None]  # (1, 1, S)
    framed = fe.frame_host(wav[:, 0, :])
    rng = jax.random.PRNGKey(0)
    v = jax.jit(lambda r, x: model.init(r, x, train=False))({"params": rng, "dropout": rng}, jnp.asarray(framed))
    y_framed = model.apply(v, jnp.asarray(framed), train=False, combine_scales=True)
    y_wave = model.apply(v, jnp.asarray(wav), train=False, combine_scales=True)
    np.testing.assert_allclose(np.asarray(y_framed), np.asarray(y_wave), atol=5e-4, rtol=1e-3)

    loader = BatchLoader(ds, 2, shuffle=False, frame_fn=fe.frame_host)
    batch = next(iter(loader))
    assert batch["audio"].ndim == 4

    tc = tiny_cfg.raw["train_config"]
    loss_fn = AudioDetectionLoss(tiny_cfg.raw["anchors"], nc, sample_duration=4, multi_label=True)
    trainer = TrainerPipeline(model, loss_fn, make_optimizer(tc["optimizer_config"], None, 1),
                              metrics_path="/tmp/ig_f", model_path="/tmp/ig_f")
    state = trainer.create_state(framed)
    state, m = trainer.train(state, loader)
    assert np.isfinite(m["aggregate_loss"])


def test_streaming_with_frame_fn_matches_waveform(tmp_path, tiny_cfg):
    """evaluate_audio with frame_fn must produce identical detection rows to
    the waveform path (same compiled math, different input layout)."""
    import sys

    sys.path.insert(0, "tests")
    import jax
    from synth import synth_clip
    from audioyolo_tpu.data.wavio import write_wav
    from audioyolo_tpu.infer import evaluate_audio, make_inference_fn
    from audioyolo_tpu.models import AudioDetectionModel

    fe = SpectralFrontend(tiny_cfg)
    model = AudioDetectionModel.from_config(tiny_cfg, num_classes=2)
    rng = jax.random.PRNGKey(1)
    x0 = jnp.zeros((1, 1, tiny_cfg.clip_samples))
    v = jax.jit(lambda r, x: model.init(r, x, train=False))({"params": rng, "dropout": rng}, x0)
    infer_fn = make_inference_fn(model, v, 0.1, 0.01, keep_k=16)

    wav = synth_clip(8000, 12.0, [(1.0, 2.0, "tone"), (5.0, 6.5, "beep")], seed=5)
    path = str(tmp_path / "long.wav")
    write_wav(path, wav, 8000)

    kwargs = dict(input_sample_rate=8000, sample_duration=4.0, batch_size=2,
                  idx2class_map={0: "a", 1: "b"}, return_rows=True)
    rows_wave = evaluate_audio(infer_fn, path, str(tmp_path), **kwargs)
    rows_framed = evaluate_audio(infer_fn, path, str(tmp_path), frame_fn=fe.frame_host, **kwargs)
    assert len(rows_wave) == len(rows_framed)
    for a, b in zip(rows_wave, rows_framed):
        assert a["class_idx"] == b["class_idx"]
        assert a["start"] == pytest.approx(b["start"], abs=1e-3)
        assert a["end"] == pytest.approx(b["end"], abs=1e-3)


def test_fused_gate_falls_back(tiny_cfg):
    """Taper / centered / non-shared-mel configs must not offer the fused
    path and must reject framed input loudly."""
    import copy

    raw = copy.deepcopy(tiny_cfg.to_dict())
    raw["taper_input"] = True
    fe = SpectralFrontend(Config(raw))
    assert fe.fused is None
    with pytest.raises(ValueError):
        fe.frame_host(np.zeros((1, 100), np.float32))
    with pytest.raises(ValueError):
        fe(jnp.zeros((1, 2, 3, 4)))

    raw2 = copy.deepcopy(tiny_cfg.to_dict())
    raw2["mfcc_config"]["melkwargs"]["win_length"] = 100
    assert SpectralFrontend(Config(raw2)).fused is None


def test_fused_rejects_overlapping_phase_windows(tiny_cfg):
    """Integer-upsampling configs where frame_len > span would make the
    host/native framers read overlapping (or out-of-bounds) windows; the
    constructor must refuse so SpectralFrontend falls back to the standard
    path instead of producing garbage (advisor round-2 finding)."""
    import copy

    from audioyolo_tpu.ops.fused_frontend import FusedFrameDFT

    with pytest.raises(ValueError, match="frame_len"):
        FusedFrameDFT(8000, 16000, 1000, 1000, 1000, 16)

    # the gate in SpectralFrontend catches it: fused path off, waveform
    # input still works end to end through the standard chain
    raw = copy.deepcopy(tiny_cfg.to_dict())
    raw["sample_rate"] = 8000
    raw["new_sample_rate"] = 16000
    fe = SpectralFrontend(Config(raw))
    assert fe.fused is None
    wav = np.zeros((1, raw["sample_duration"] * 8000), np.float32)
    out = np.asarray(fe(jnp.asarray(wav)))
    assert np.isfinite(out).all()


def test_bf16_storage_mode_close(full_cfg):
    """frontend_precision 'bf16' (bf16-stored spectrum) must track the fp32
    fused features closely — it only adds output-store rounding on top of
    DEFAULT's bf16 MXU passes. (Measured slower end-to-end on the real chip
    — kept as a documented opt-in; docs/PERFORMANCE.md round 4.)"""
    import copy

    raw = copy.deepcopy(full_cfg.to_dict())
    raw.setdefault("tpu_config", {})["frontend_precision"] = "bf16"
    from audioyolo_tpu.config import Config

    fe16 = SpectralFrontend(Config(raw))
    fe32 = SpectralFrontend(full_cfg)
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal((2, full_cfg.clip_samples)) * 0.1).astype(np.float32)
    framed = fe32.frame_host(wav)
    a = np.asarray(fe16(jnp.asarray(framed)))
    b = np.asarray(fe32(jnp.asarray(framed)))
    # features are standardized per (sample, channel): compare absolutely.
    # The MFCC channel's 80 dB floor discontinuity amplifies isolated cells
    # (measured max ~1.54) — the mean bound is the meaningful one.
    assert np.abs(a - b).mean() < 0.05
    assert np.abs(a - b).max() < 2.5


def test_int8_dft_mode_close(full_cfg):
    """frontend_precision 'int8' (int8 DFT GEMM, host-quantized frames):
    per-column matrix scales fold into the mel matrix, per-clip input scale
    folds in after mel — algebra is exact, the only noise is the int8
    rounding of frames (~48 dB) and matrix (~1e-3 relative). Features must
    track the fp32 path closely."""
    import copy

    raw = copy.deepcopy(full_cfg.to_dict())
    raw.setdefault("tpu_config", {})["frontend_precision"] = "int8"
    from audioyolo_tpu.config import Config

    fe8 = SpectralFrontend(Config(raw))
    fe32 = SpectralFrontend(full_cfg)
    assert fe8.fused_int8 and fe8.fused is not None
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal((2, full_cfg.clip_samples)) * 0.1).astype(np.float32)
    q, scale = fe8.frame_host_int8(wav)
    assert q.dtype == np.int8 and scale.shape == (2,)
    a = np.asarray(fe8((jnp.asarray(q), jnp.asarray(scale))))
    b = np.asarray(fe32(jnp.asarray(fe32.frame_host(wav))))
    assert a.shape == b.shape
    assert np.abs(a - b).mean() < 0.06, np.abs(a - b).mean()
    assert np.abs(a - b).max() < 2.0, np.abs(a - b).max()

    # int16 PCM input quantizes through the same helper
    wav_i16 = np.clip(np.round(wav * 32768.0), -32768, 32767).astype(np.int16)
    q2, s2 = fe8.frame_host_int8(wav_i16)
    a2 = np.asarray(fe8((jnp.asarray(q2), jnp.asarray(s2))))
    assert np.abs(a2 - b).mean() < 0.06
