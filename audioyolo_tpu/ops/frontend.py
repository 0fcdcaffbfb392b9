"""Spectral frontend: waveform -> stacked log-mel + MFCC feature image.

Replaces the reference's torchaudio transform chain
(``modules/_architecture.py:25-37, 84-108``: Resample -> MelSpectrogram / MFCC
-> AmplitudeToDB(top_db=80) -> per-sample standardization -> channel concat)
with a TPU-first formulation: framing is a reshape (hop == n_fft in the shipped
config) or gather, the rFFT is a GEMM against a window-folded DFT matrix, and
mel / DCT projections are further GEMMs — the whole frontend is three matmuls
feeding the MXU plus cheap VPU elementwise work, all under one jit.

All constants (window, DFT, mel filterbank, DCT) are precomputed on host in
float64 and embedded as float32 compile-time constants. Numerics follow the
public definitions used by torchaudio (HTK mel scale, Slaney filterbank norm,
ortho DCT-II, power spectrogram, per-call top_db floor) so that checkpoints
trained against the reference featurizer transfer at parity.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config, load_config
from .resample import Resampler


# --------------------------------------------------------------------------
# Host-side constant builders (float64 -> float32)
# --------------------------------------------------------------------------


def hann_window(n: int, periodic: bool = True, dtype=np.float32) -> np.ndarray:
    """Raised-cosine window. ``periodic=True`` matches torch.hann_window default
    (used inside the STFT); ``periodic=False`` is the symmetric variant (used by
    the optional input taper, reference ``modules/_architecture.py:89-94``)."""
    if n == 1:
        return np.ones(1, dtype=dtype)
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    return (0.5 * (1.0 - np.cos(2.0 * np.pi * k / denom))).astype(dtype)


_WINDOW_FNS = {
    "hann": np.hanning,
    "hamming": np.hamming,
    "blackman": np.blackman,
    "bartlett": np.bartlett,
    "kaiser": lambda n: np.kaiser(n, 12.0),  # torch.kaiser_window default beta
}


def taper_window(name: str, n: int, periodic: bool = False, dtype=np.float32) -> np.ndarray:
    """``torch.<name>_window(n, periodic=...)`` equivalent for the input taper
    (reference builds any such window reflectively,
    ``modules/_architecture.py:89-94``)."""
    try:
        fn = _WINDOW_FNS[name]
    except KeyError:
        raise ValueError(
            f"unsupported taper window '{name}'; supported: {sorted(_WINDOW_FNS)}"
        ) from None
    if n == 1:
        return np.ones(1, dtype=dtype)
    if periodic:  # periodic = symmetric window of length n+1, last sample dropped
        return fn(n + 1)[:n].astype(dtype)
    return fn(n).astype(dtype)


def dft_power_matrix(n_fft: int, window: np.ndarray, dtype=np.float32) -> np.ndarray:
    """Window-folded real-DFT matrix, shape ``(n_fft, 2*(n_fft//2+1))``.

    ``frames @ W`` yields ``[Re X_k | Im X_k]`` for the onesided spectrum; the
    analysis window is pre-multiplied into the matrix so the framed signal needs
    no separate elementwise pass.
    """
    n_freq = n_fft // 2 + 1
    n = np.arange(n_fft, dtype=np.float64)[:, None]
    k = np.arange(n_freq, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    cos = np.cos(ang) * window.astype(np.float64)[:, None]
    sin = -np.sin(ang) * window.astype(np.float64)[:, None]
    return np.concatenate([cos, sin], axis=1).astype(dtype)


def _hz_to_mel(f: np.ndarray, mel_scale: str) -> np.ndarray:
    f = np.asarray(f, dtype=np.float64)
    if mel_scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney mel scale: linear below 1 kHz, log above.
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    mel = f / f_sp
    return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz(m: np.ndarray, mel_scale: str) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    if mel_scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_sp = 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    freq = f_sp * m
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


def mel_filterbank(
    n_freqs: int,
    n_mels: int,
    sample_rate: int,
    f_min: float = 0.0,
    f_max: Optional[float] = None,
    mel_scale: str = "htk",
    norm: Optional[str] = "slaney",
    dtype=np.float32,
) -> np.ndarray:
    """Triangular mel filterbank, shape ``(n_freqs, n_mels)``."""
    f_max = f_max if f_max is not None else sample_rate / 2.0
    all_freqs = np.linspace(0.0, sample_rate // 2, n_freqs)
    m_pts = np.linspace(
        _hz_to_mel(np.array(f_min), mel_scale),
        _hz_to_mel(np.array(f_max), mel_scale),
        n_mels + 2,
    )
    f_pts = _mel_to_hz(m_pts, mel_scale)
    f_diff = f_pts[1:] - f_pts[:-1]
    slopes = f_pts[None, :] - all_freqs[:, None]
    down = -slopes[:, :-2] / f_diff[:-1]
    up = slopes[:, 2:] / f_diff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    return fb.astype(dtype)


def dct_matrix(n_mfcc: int, n_mels: int, ortho: bool = True, dtype=np.float32) -> np.ndarray:
    """DCT-II basis, shape ``(n_mels, n_mfcc)``; ``mels @ D`` gives cepstra."""
    n = np.arange(n_mels, dtype=np.float64)[:, None]
    k = np.arange(n_mfcc, dtype=np.float64)[None, :]
    d = 2.0 * np.cos(np.pi / n_mels * (n + 0.5) * k)
    if ortho:
        d[:, :1] = d[:, :1] / math.sqrt(2.0)
        d = d * math.sqrt(1.0 / (2.0 * n_mels))
    return d.astype(dtype)


# --------------------------------------------------------------------------
# In-graph ops
# --------------------------------------------------------------------------


def frame_signal(x: jax.Array, n_fft: int, hop: int, center: bool, pad_mode: str) -> jax.Array:
    """(..., samples) -> (..., n_frames, n_fft). Reshape fast-path when frames
    are contiguous and non-overlapping (the shipped config: hop == n_fft)."""
    if center:
        pad = n_fft // 2
        mode = {"reflect": "reflect", "constant": "constant", "replicate": "edge"}[pad_mode]
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode=mode)
    n = x.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    if hop == n_fft and n % n_fft == 0:
        return x.reshape(x.shape[:-1] + (n_frames, n_fft))
    starts = jnp.arange(n_frames) * hop
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    return jnp.take(x, idx, axis=-1)


def stft_power(
    x: jax.Array,
    dft_w: jax.Array,
    n_fft: int,
    hop: int,
    center: bool = False,
    pad_mode: str = "reflect",
    power: float = 2.0,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """(..., samples) -> (..., n_frames, n_freq) power spectrogram via GEMM-DFT."""
    frames = frame_signal(x.astype(jnp.float32), n_fft, hop, center, pad_mode)
    spec = jnp.matmul(frames, dft_w, preferred_element_type=jnp.float32,
                      precision=precision)
    n_freq = n_fft // 2 + 1
    p = spec[..., :n_freq] ** 2 + spec[..., n_freq:] ** 2
    if power == 2.0:
        return p
    if power == 1.0:
        return jnp.sqrt(p)
    return p ** (power / 2.0)


def amplitude_to_db(
    x: jax.Array,
    top_db: Optional[float] = None,
    multiplier: float = 10.0,
    amin: float = 1e-10,
    ref: float = 1.0,
) -> jax.Array:
    """Power/amplitude -> decibels with an optional per-sample dynamic-range
    floor (semantics of the reference's AmplitudeToDB(top_db=80) at
    ``modules/_architecture.py:29,100-101``: the floor max is taken per leading
    batch element over all remaining axes)."""
    db = multiplier * jnp.log10(jnp.maximum(x, amin))
    db = db - multiplier * math.log10(max(amin, ref))
    if top_db is not None:
        reduce_axes = tuple(range(1, db.ndim))
        floor = jnp.max(db, axis=reduce_axes, keepdims=True) - top_db
        db = jnp.maximum(db, floor)
    return db


def standardize_per_channel(x: jax.Array, e: float = 1e-5) -> jax.Array:
    """Zero-mean/unit-std per (sample, channel) over the trailing two axes,
    with an unbiased std estimate (reference ``scale_input``,
    ``modules/_architecture.py:182-189``)."""
    mu = jnp.mean(x, axis=(-2, -1), keepdims=True)
    n = x.shape[-2] * x.shape[-1]
    var = jnp.sum((x - mu) ** 2, axis=(-2, -1), keepdims=True) / max(n - 1, 1)
    return (x - mu) / (jnp.sqrt(var) + e)


# --------------------------------------------------------------------------
# Composed frontend
# --------------------------------------------------------------------------


class MelBranch:
    """One MelSpectrogram equivalent (window-folded DFT GEMM + mel GEMM),
    parameter conventions and defaults matching torchaudio's
    ``MelSpectrogram`` (win_length=n_fft, hop=win_length//2, center=True,
    power=2, htk scale, no norm)."""

    def __init__(self, mel_cfg: dict, sr_model: int,
                 precision=jax.lax.Precision.HIGHEST):
        self.precision = precision
        # torchaudio's MelSpectrogram defaults (n_fft=400, etc.) so an empty
        # mfcc_config.melkwargs — valid for torchaudio.transforms.MFCC — works
        self.n_fft = int(mel_cfg.get("n_fft", 400))
        self.win_length = int(mel_cfg.get("win_length") or self.n_fft)
        self.hop = int(mel_cfg.get("hop_length") or self.win_length // 2)
        self.center = bool(mel_cfg.get("center", True))
        self.pad_mode = mel_cfg.get("pad_mode", "reflect")
        self.power = float(mel_cfg.get("power", 2.0))
        self.n_mels = int(mel_cfg.get("n_mels", 128))

        window = np.zeros(self.n_fft, dtype=np.float64)
        w = hann_window(self.win_length, periodic=True, dtype=np.float64)
        off = (self.n_fft - self.win_length) // 2
        window[off : off + self.win_length] = w

        self.dft_w = jnp.asarray(dft_power_matrix(self.n_fft, window))
        # host copy kept: PallasMelFrontend needs the filterbank as numpy, and
        # MelBranch may be constructed inside a jit trace (model init), where
        # np.asarray(jnp_constant) would fail on the tracer
        self.mel_fb_np = mel_filterbank(
            self.n_fft // 2 + 1,
            self.n_mels,
            sr_model,
            f_min=float(mel_cfg.get("f_min", 0.0)),
            f_max=mel_cfg.get("f_max"),
            mel_scale=mel_cfg.get("mel_scale", "htk"),
            norm=mel_cfg.get("norm"),
        )
        self.mel_fb = jnp.asarray(self.mel_fb_np)

    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, samples) -> (B, n_frames, n_mels) mel power."""
        p = stft_power(x, self.dft_w, self.n_fft, self.hop, self.center,
                       self.pad_mode, self.power, precision=self.precision)
        return jnp.matmul(p, self.mel_fb, preferred_element_type=jnp.float32,
                          precision=self.precision)


class SpectralFrontend:
    """waveform @ dataset rate -> (B, n_mels, n_frames, 2) NHWC feature image.

    Channel 0 is the log-mel spectrogram, channel 1 the MFCC image, both passed
    through the 80 dB floor and (optionally) standardized, matching the
    reference forward at ``modules/_architecture.py:84-108``. The underlying
    mel power spectrogram is computed once and shared by both branches when
    ``mfcc_config.melkwargs`` equals ``melspectrogram_config`` (it does in the
    shipped config); otherwise the MFCC branch runs its own STFT + filterbank,
    exactly as the reference builds two independent transforms
    (``modules/_architecture.py:30-37``).
    """

    def __init__(self, config=None):
        cfg = load_config(config) if not isinstance(config, Config) else config
        self.cfg = cfg
        mel_cfg = cfg.raw["melspectrogram_config"]
        mfcc_cfg = cfg.raw["mfcc_config"]
        self.sr_in = cfg.sample_rate
        self.sr_model = cfg.new_sample_rate
        self.resampler = Resampler(self.sr_in, self.sr_model)

        # GEMM precision for the whole DSP chain: "highest" (default) is
        # fp32-exact for checkpoint parity; "default" runs single-pass bf16
        # MXU GEMMs with fp32 accumulation — ~1.7x faster frontend, feature
        # perturbation ~1e-3 relative (immaterial for a bf16 detector body).
        prec_name = str(cfg.raw.get("tpu_config", {}).get(
            "frontend_precision", "highest")).lower()
        self.precision = {
            "highest": jax.lax.Precision.HIGHEST,
            "high": jax.lax.Precision.HIGH,
            "default": jax.lax.Precision.DEFAULT,
            # "bf16": DEFAULT precision + bf16-STORED spectrum on the fused
            # path (ops/fused_frontend.py __call__ storage_dtype) — halves
            # the ~1 GB/batch spectrum intermediate; numerics add only the
            # output-store rounding on top of "default"'s bf16 MXU passes.
            # Measured NEGATIVE end-to-end at the headline posture (18.2 vs
            # 15.4 ms/batch — the pre-GEMM cast materializes its own copy);
            # kept opt-in as a documented negative result.
            "bf16": jax.lax.Precision.DEFAULT,
            # "int8": int8 x int8 -> int32 DFT GEMM on the MXU (2x bf16
            # peak) for host-quantized int8 framed input — see
            # fused_frontend.int8_matrix/power_int8 and __call__ below
            "int8": jax.lax.Precision.DEFAULT,
        }[prec_name]
        self.fused_storage_dtype = jnp.bfloat16 if prec_name == "bf16" else None
        self.fused_int8 = prec_name == "int8"
        # int8 path only: materialize the DFT GEMM accumulator (the model's
        # biggest intermediate) in bf16 instead of int32 — see
        # fused_frontend.power_int8. Opt-in; accuracy-gate before adopting.
        self.int8_spectrum_dtype = (
            jnp.bfloat16
            if str(cfg.raw.get("tpu_config", {}).get(
                "int8_spectrum", "int32")).lower() in ("bf16", "bfloat16")
            else None
        )

        self.mel = MelBranch(mel_cfg, self.sr_model, precision=self.precision)
        self.n_mels = self.mel.n_mels
        mk = dict(mfcc_cfg.get("melkwargs") or {})
        self.shared_mel = mk == dict(mel_cfg)
        self.mfcc_mel = (self.mel if self.shared_mel
                         else MelBranch(mk, self.sr_model, precision=self.precision))

        self.n_mfcc = int(mfcc_cfg["n_mfcc"])
        self.log_mels = bool(mfcc_cfg.get("log_mels", False))
        self.dct_m = jnp.asarray(
            dct_matrix(self.n_mfcc, self.mfcc_mel.n_mels,
                       ortho=mfcc_cfg.get("norm", "ortho") == "ortho")
        )

        self.taper = None
        if cfg.raw.get("taper_input"):
            self.taper = jnp.asarray(taper_window(
                cfg.raw.get("taper_window", "hann"), cfg.model_samples, periodic=False
            ))
        self.scale_input = bool(cfg.raw.get("scale_input", True))

        # Fused resample+frame+DFT path (ops/fused_frontend.py): removes the
        # two relayout-forcing device reshapes when the caller supplies
        # phase-grouped frames (see frame_host). Eligible for the shipped
        # config shape: non-overlapping frames, no centering/taper, one
        # shared mel config.
        self.fused = None
        if (
            self.taper is None
            and not self.mel.center
            and self.mel.hop == self.mel.n_fft
            and self.shared_mel
        ):
            try:
                from .fused_frontend import get_fused_frame_dft

                self.fused = get_fused_frame_dft(
                    self.sr_in, self.sr_model, self.mel.n_fft, self.mel.hop,
                    self.mel.win_length, cfg.n_frames,
                )
            except ValueError:  # e.g. frame count not phase-divisible
                self.fused = None

        # Pallas DFT+power+mel kernel (ops/pallas_frontend.py): keeps the
        # ~1 GB/batch spectrum intermediate in VMEM instead of HBM. Measured
        # SLOWER end-to-end than the XLA GEMM pair on v5e (21.5 vs 17.7 ms at
        # B=256 — the stage is MXU-compute-bound and Mosaic's matmul codegen
        # trails XLA's here; docs/PERFORMANCE.md "negative results"), so it is
        # opt-in: tpu_config.pallas_frontend: on | off (default). Only valid
        # for the bf16 "default" posture (it IS a bf16 kernel) with power=2.
        self.pallas_mel = None
        if (
            self.fused is not None
            and self.precision == jax.lax.Precision.DEFAULT
            and self.mel.power == 2.0
            and str(cfg.raw.get("tpu_config", {}).get(
                "pallas_frontend", "off")).lower() == "on"
        ):
            from .pallas_frontend import PallasMelFrontend

            pm = PallasMelFrontend(self.fused, self.mel.mel_fb_np)
            if pm.ok:  # fits the 16 MB VMEM budget
                self.pallas_mel = pm

    def frame_host(self, audio: np.ndarray) -> np.ndarray:
        """Host-side framing for the fused path: (B, S) or (B, 1, S) raw audio
        (float or int16) -> (B, n_ph, n_groups, frame_len). Feed the result to
        ``__call__`` (or the model) instead of the waveform; the device then
        runs pure GEMMs with no relayouts."""
        if self.fused is None:
            raise ValueError("fused frontend path not available for this config")
        if audio.ndim == 3:
            audio = audio[:, 0, :]
        return self.fused.frame_host(np.asarray(audio))

    def frame_host_int8(self, audio: np.ndarray):
        """Host framing + per-clip symmetric int8 quantization for the
        ``frontend_precision: int8`` posture: (B, S) or (B, 1, S) raw audio
        -> ``(q (B, n_ph, n_groups, frame_len) int8, scale (B,) f32)`` with
        ``q * scale`` reproducing the float frames. Ship 1/4 the f32 frame
        bytes; the model consumes the tuple directly."""
        frames = self.frame_host(audio)
        if frames.dtype == np.int16:
            f = frames.astype(np.float32) * (1.0 / 32768.0)
        else:
            f = frames.astype(np.float32)
        a = np.abs(f).max(axis=(1, 2, 3))
        scale = (np.maximum(a, 1e-12) / 127.0).astype(np.float32)
        q = np.clip(np.round(f / scale[:, None, None, None]), -127, 127
                    ).astype(np.int8)
        return q, scale

    def _fused_int8_mel(self, q: jax.Array, scale: jax.Array) -> jax.Array:
        """(q int8 frames, per-clip scale) -> (B, n_ph, G, n_mels) mel power
        in phase order. The per-column matrix scales fold into the mel
        filterbank rows (s_k**2, precomputed once); the per-clip input scale
        folds into the (15x smaller) mel output — the big GEMM and the
        spectrum intermediate stay pure integer/unscaled."""
        if not self.shared_mel or self.mel.power != 2.0:
            raise ValueError(
                "frontend_precision 'int8' requires shared mel/MFCC settings "
                "and power=2"
            )
        p = self.fused.power_int8(q, storage_dtype=self.int8_spectrum_dtype)
        if not hasattr(self, "_mel_fb_i8"):
            _, s_k = self.fused.int8_matrix()
            self._mel_fb_i8 = jnp.asarray(
                np.asarray(self.mel.mel_fb_np, np.float64)
                * (np.asarray(s_k, np.float64)[:, None] ** 2)
            ).astype(jnp.float32)
        mel_rg = jnp.matmul(p, self._mel_fb_i8,
                            preferred_element_type=jnp.float32,
                            precision=self.precision)
        return mel_rg * (scale[:, None, None, None] ** 2)

    def __call__(self, audio: jax.Array) -> jax.Array:
        """``audio``: (B, S) or (B, 1, S) waveform at the dataset sample rate,
        or phase-grouped frames (B, n_ph, n_groups, frame_len) produced by
        :meth:`frame_host` (fused path — no device relayouts), or the
        ``(q int8, scale)`` tuple from :meth:`frame_host_int8` when
        ``frontend_precision: int8``.

        int16 input is dequantized in-graph (``x / 32768``, the same scaling
        as the WAV readers) — shipping PCM16 to the device quarters
        host->device traffic and is lossless for 16-bit sources.
        """
        if isinstance(audio, (tuple, list)):
            if not self.fused_int8 or self.fused is None:
                raise ValueError(
                    "(q, scale) framed-int8 input requires tpu_config."
                    "frontend_precision: int8 and the fused path"
                )
            q, scale = audio
            mel_rg = self._fused_int8_mel(q, scale)
            return self._images(self.fused.reorder_frames(mel_rg), None)
        if audio.ndim == 4:
            if self.fused is None:
                raise ValueError("framed input given but fused path unavailable")
            if self.pallas_mel is not None and jax.default_backend() == "tpu":
                # one VMEM-resident Pallas pass: DFT GEMM + power + mel GEMM
                # without materializing the (B, n_ph, G, 2*n_freq) spectrum
                mel_rg = self.pallas_mel(audio)
            else:
                # project to mel in phase order, THEN restore time order: the
                # transpose moves (B, T, n_mels) instead of (B, T, n_freq)
                mel_rg = jnp.matmul(
                    self.fused(audio, power=self.mel.power,
                               precision=self.precision, reorder=False,
                               storage_dtype=self.fused_storage_dtype),
                    self.mel.mel_fb,
                    preferred_element_type=jnp.float32,
                    precision=self.precision,
                )
            return self._images(self.fused.reorder_frames(mel_rg), None)
        if audio.ndim == 3:
            audio = audio[:, 0, :]
        if jnp.issubdtype(audio.dtype, jnp.integer):
            audio = audio.astype(jnp.float32) * (1.0 / 32768.0)
        x = self.resampler(audio.astype(jnp.float32))
        if self.taper is not None:
            x = x * self.taper[None, :]

        # (B, T, M) mel power for the spectrogram branch.
        mel_power = self.mel(x)

        return self._images(mel_power, x)

    def _images(self, mel_power: jax.Array, x: Optional[jax.Array]) -> jax.Array:
        """(B, T, M) mel power (+ waveform for a non-shared MFCC branch) ->
        (B, M, T, 2) feature image."""
        # MFCC branch: torchaudio's MFCC (log_mels=False) floors the log-mel
        # at 80 dB below the per-sample max before the DCT — its internal
        # AmplitudeToDB("power", 80.0) is hardcoded in MFCC.__init__; with
        # log_mels=True it takes log(mel + 1e-6) instead.
        mfcc_mel_power = mel_power if self.shared_mel else self.mfcc_mel(x)
        if self.log_mels:
            log_mel = jnp.log(mfcc_mel_power + 1e-6)
        else:
            log_mel = amplitude_to_db(mfcc_mel_power, top_db=80.0)
        mfcc = jnp.matmul(log_mel, self.dct_m, preferred_element_type=jnp.float32,
                          precision=self.precision)

        # Outer AmplitudeToDB(top_db=80) applied to BOTH branches, mirroring
        # the reference quirk of running MFCC coefficients through a power->dB
        # map a second time (modules/_architecture.py:100-101).
        mel_img = amplitude_to_db(mel_power, top_db=80.0)
        mfcc_img = amplitude_to_db(mfcc, top_db=80.0)

        if self.scale_input:
            mel_img = standardize_per_channel(mel_img)
            mfcc_img = standardize_per_channel(mfcc_img)

        # (B, T, M) -> (B, M, T); stack as NHWC channels [mel, mfcc].
        feat = jnp.stack(
            [jnp.swapaxes(mel_img, -1, -2), jnp.swapaxes(mfcc_img, -1, -2)], axis=-1
        )
        # saved residual under the trainer's selective-remat policy: the
        # frontend has no trainable upstream but conv1's weight-grad needs
        # this image — without the name the whole DFT+mel frontend would be
        # recomputed in backward (models/layers.py::tape)
        from jax.ad_checkpoint import checkpoint_name

        return checkpoint_name(feat, "ayt_tape")

    @property
    def out_shape(self):
        return (self.n_mels, self.cfg.n_frames, 2)
