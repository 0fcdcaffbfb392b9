"""Frontend numerics vs independent oracles.

Oracles: torch.stft (independent C++ FFT), scipy.fft.dct (DCT-II ortho),
float64 direct evaluations of the mel-filterbank / dB definitions. None of
these share code with audioyolo_tpu's GEMM formulation, so agreement is a real
cross-check of the math (SURVEY.md §4 item 1).
"""

import numpy as np
import pytest
import scipy.fft
import torch

import jax.numpy as jnp

from audioyolo_tpu.ops.frontend import (
    SpectralFrontend,
    amplitude_to_db,
    dct_matrix,
    dft_power_matrix,
    hann_window,
    mel_filterbank,
    standardize_per_channel,
    stft_power,
    taper_window,
)


def test_hann_window_matches_torch():
    for n in (64, 200, 1000):
        np.testing.assert_allclose(
            hann_window(n, periodic=True), torch.hann_window(n, periodic=True).numpy(), atol=1e-6
        )
        np.testing.assert_allclose(
            hann_window(n, periodic=False), torch.hann_window(n, periodic=False).numpy(), atol=1e-6
        )


def test_stft_power_matches_torch_stft(rng):
    n_fft, hop = 200, 120  # overlapping case exercises the gather path
    x = rng.standard_normal(4000).astype(np.float32)
    w = hann_window(n_fft, periodic=True)
    dft_w = jnp.asarray(dft_power_matrix(n_fft, w.astype(np.float64)))
    ours = np.asarray(stft_power(jnp.asarray(x)[None], dft_w, n_fft, hop, center=False))

    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=n_fft,
        hop_length=hop,
        window=torch.from_numpy(w),
        center=False,
        return_complex=True,
    )
    ref_p = ref.abs().numpy() ** 2  # (freq, time)
    np.testing.assert_allclose(ours[0], ref_p.T, rtol=1e-4, atol=1e-4)


def test_stft_reshape_fastpath_equals_gather(rng):
    n_fft = 200
    x = jnp.asarray(rng.standard_normal(2000).astype(np.float32))[None]
    w = hann_window(n_fft).astype(np.float64)
    dft_w = jnp.asarray(dft_power_matrix(n_fft, w))
    fast = stft_power(x, dft_w, n_fft, hop=n_fft, center=False)
    # pad by one sample to defeat the divisibility fast-path
    slow = stft_power(jnp.pad(x, ((0, 0), (0, 1))), dft_w, n_fft, hop=n_fft, center=False)
    np.testing.assert_allclose(np.asarray(fast), np.asarray(slow), rtol=1e-5, atol=1e-5)


def _mel_fbank_direct(n_freqs, n_mels, sr, fmax=None):
    """Direct per-filter triangle evaluation in float64 (HTK scale, slaney norm)."""
    fmax = fmax or sr / 2
    hz2mel = lambda f: 2595.0 * np.log10(1.0 + f / 700.0)
    mel2hz = lambda m: 700.0 * (10 ** (m / 2595.0) - 1.0)
    mels = np.linspace(hz2mel(0.0), hz2mel(fmax), n_mels + 2)
    fpts = mel2hz(mels)
    freqs = np.linspace(0, sr // 2, n_freqs)
    fb = np.zeros((n_freqs, n_mels))
    for m in range(n_mels):
        lo, mid, hi = fpts[m], fpts[m + 1], fpts[m + 2]
        for i, f in enumerate(freqs):
            if lo < f <= mid and mid > lo:
                fb[i, m] = (f - lo) / (mid - lo)
            elif mid < f < hi and hi > mid:
                fb[i, m] = (hi - f) / (hi - mid)
        # boundary: f == lo contributes 0 via rising edge but may sit on the
        # falling edge of an adjacent triangle; the vectorized formula treats
        # it uniformly — evaluate it the same way for exactness:
        for i, f in enumerate(freqs):
            up = (f - lo) / (mid - lo) if mid > lo else 0.0
            down = (hi - f) / (hi - mid) if hi > mid else 0.0
            fb[i, m] = max(0.0, min(up, down))
        fb[:, m] *= 2.0 / (hi - lo)
    return fb


def test_mel_filterbank_matches_direct():
    fb = mel_filterbank(101, 16, 8000, mel_scale="htk", norm="slaney")
    ref = _mel_fbank_direct(101, 16, 8000)
    np.testing.assert_allclose(fb, ref, rtol=1e-5, atol=1e-7)


def test_mel_filterbank_no_norm_peak_is_one():
    fb = mel_filterbank(501, 32, 16000, mel_scale="htk", norm=None)
    # un-normalized triangles peak near 1 (grid resolution limited)
    assert 0.5 < fb.max() <= 1.0 + 1e-6


def test_dct_matrix_matches_scipy():
    d = dct_matrix(13, 32, ortho=True)
    x = np.random.default_rng(0).standard_normal((5, 32)).astype(np.float64)
    ours = x @ d.astype(np.float64)
    ref = scipy.fft.dct(x, type=2, norm="ortho", axis=-1)[:, :13]
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_amplitude_to_db_definition(rng):
    x = np.abs(rng.standard_normal((2, 3, 50)).astype(np.float32)) * 1e4 + 1e-12
    out = np.asarray(amplitude_to_db(jnp.asarray(x), top_db=80.0))
    ref = 10.0 * np.log10(np.maximum(x, 1e-10))
    floor = ref.reshape(2, -1).max(axis=1)[:, None, None] - 80.0
    ref = np.maximum(ref, floor)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-3)


def test_amplitude_to_db_floor_is_per_sample():
    x = np.ones((2, 4), np.float32)
    x[0, 0] = 1e12  # sample 0 has a huge max -> its other entries get floored
    out = np.asarray(amplitude_to_db(jnp.asarray(x), top_db=80.0))
    assert out[0, 1] == pytest.approx(120.0 - 80.0, abs=1e-3)
    assert out[1, 1] == pytest.approx(0.0, abs=1e-6)


def test_standardize_unbiased_std(rng):
    x = rng.standard_normal((3, 8, 10)).astype(np.float32)
    out = np.asarray(standardize_per_channel(jnp.asarray(x)))
    tx = torch.from_numpy(x)
    mu = tx.mean(dim=(-2, -1))[:, None, None]
    std = tx.std(dim=(-2, -1))[:, None, None]  # unbiased, matching reference
    ref = ((tx - mu) / (std + 1e-5)).numpy()
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_frontend_output_shape_and_finiteness(tiny_cfg, rng):
    fe = SpectralFrontend(tiny_cfg)
    wav = rng.standard_normal((2, 1, tiny_cfg.clip_samples)).astype(np.float32)
    out = np.asarray(fe(jnp.asarray(wav)))
    assert out.shape == (2, 32, tiny_cfg.n_frames, 2)
    assert np.isfinite(out).all()
    # standardized channels: near-zero mean, near-unit std per sample/channel
    for b in range(2):
        for c in range(2):
            assert abs(out[b, :, :, c].mean()) < 1e-3
            assert 0.9 < out[b, :, :, c].std() < 1.1


def test_frontend_silence_is_finite(tiny_cfg):
    fe = SpectralFrontend(tiny_cfg)
    out = np.asarray(fe(jnp.zeros((1, 1, tiny_cfg.clip_samples))))
    assert np.isfinite(out).all()


def test_taper_windows_match_torch():
    """Reference builds any torch.<name>_window reflectively
    (modules/_architecture.py:89-94); ours must match each supported name."""
    for name in ("hann", "hamming", "blackman", "bartlett", "kaiser"):
        tfn = getattr(torch, f"{name}_window")
        for n in (64, 201):
            for periodic in (False, True):
                ref = tfn(n, periodic=periodic).numpy()
                np.testing.assert_allclose(
                    taper_window(name, n, periodic=periodic), ref, atol=2e-6,
                    err_msg=f"{name} n={n} periodic={periodic}",
                )
    with pytest.raises(ValueError):
        taper_window("nuttall", 64)


def _mfcc_oracle(x, mel_fb64, n_fft, hop, win_length, n_mfcc):
    """float64 chain oracle: torch.stft power -> mel -> per-sample 80 dB
    floored log-mel (torchaudio MFCC's internal AmplitudeToDB("power", 80)) ->
    ortho DCT-II. Returns (T, n_mfcc)."""
    w = torch.hann_window(win_length, periodic=True, dtype=torch.float64)
    spec = torch.stft(
        torch.from_numpy(x.astype(np.float64)), n_fft, hop_length=hop,
        win_length=win_length, window=w, center=False, return_complex=True,
    )
    p = (spec.abs() ** 2).numpy().T  # (T, F)
    mel = p @ mel_fb64
    logmel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    logmel = np.maximum(logmel, logmel.max() - 80.0)
    return scipy.fft.dct(logmel, type=2, norm="ortho", axis=-1)[:, :n_mfcc]


def _outer_db_standardize(img):
    db = 10.0 * np.log10(np.maximum(img, 1e-10))
    db = np.maximum(db, db.max() - 80.0)
    mu = db.mean()
    std = db.std(ddof=1)
    return (db - mu) / (std + 1e-5)


def test_mfcc_branch_matches_torchaudio_definition(tiny_cfg, rng):
    """Full MFCC channel vs an independent float64 oracle on a signal whose
    mel dynamic range exceeds 80 dB, so the internal floor actually bites."""
    fe = SpectralFrontend(tiny_cfg)
    sr = tiny_cfg.sample_rate
    t = np.arange(tiny_cfg.clip_samples) / sr
    x = (np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)

    out = np.asarray(fe(jnp.asarray(x)[None]))  # (1, M, T, 2)
    mel_fb64 = np.asarray(fe.mel.mel_fb, np.float64)
    mfcc = _mfcc_oracle(x, mel_fb64, fe.mel.n_fft, fe.mel.hop, fe.mel.win_length, fe.n_mfcc)
    ref = _outer_db_standardize(mfcc)

    np.testing.assert_allclose(out[0, :, :, 1], ref.T, rtol=2e-3, atol=2e-3)


def test_mfcc_with_distinct_melkwargs(tiny_cfg, rng):
    """When mfcc_config.melkwargs differs from melspectrogram_config the MFCC
    branch must run its own STFT/filterbank (the reference builds two
    independent transforms, modules/_architecture.py:30-37) — previously a
    silent wrong-MFCC path."""
    import copy

    from audioyolo_tpu.config import Config

    raw = copy.deepcopy(tiny_cfg.to_dict())
    # same n_fft/hop/n_mels (shapes must agree for the channel concat, as in
    # the reference) but a shorter analysis window and no filterbank norm
    raw["mfcc_config"]["melkwargs"]["win_length"] = 100
    raw["mfcc_config"]["melkwargs"]["norm"] = None
    cfg = Config(raw)

    fe = SpectralFrontend(cfg)
    assert not fe.shared_mel
    assert fe.mfcc_mel is not fe.mel

    sr = cfg.sample_rate
    t = np.arange(cfg.clip_samples) / sr
    x = (np.sin(2 * np.pi * 700.0 * t) + 0.01 * rng.standard_normal(len(t))).astype(np.float32)
    out = np.asarray(fe(jnp.asarray(x)[None]))

    mel_fb64 = np.asarray(fe.mfcc_mel.mel_fb, np.float64)
    mfcc = _mfcc_oracle(x, mel_fb64, fe.mfcc_mel.n_fft, fe.mfcc_mel.hop,
                        fe.mfcc_mel.win_length, fe.n_mfcc)
    ref = _outer_db_standardize(mfcc)
    np.testing.assert_allclose(out[0, :, :, 1], ref.T, rtol=2e-3, atol=5e-3)

    # and it must differ from the shared-mel result
    out_shared = np.asarray(SpectralFrontend(tiny_cfg)(jnp.asarray(x)[None]))
    assert np.abs(out[0, :, :, 1] - out_shared[0, :, :, 1]).max() > 1e-3
