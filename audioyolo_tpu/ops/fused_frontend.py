"""Fused resample+frame+window+DFT: the frontend as phase-grouped GEMMs.

The reference frontend chain (``modules/_architecture.py:84-108``) is
resample -> frame -> window -> DFT -> power -> mel. Everything before the
power is *linear*, so the polyphase sinc resampler (ops/resample.py) and the
window-folded DFT (ops/frontend.py) compose into constant matrices computed
once in float64 on the host.

Why this matters on TPU: the straightforward pipeline needs two reshapes of
the flat waveform (``(B, L) -> (B, blocks, 441)`` for the resampler and
``(B, 960000) -> (B, 960, 1000)`` for the framing). Neither minor dim is a
lane multiple, so both are physical relayouts — measured at ~8 ms and ~5 ms
of a 14 ms frontend at B=32 (docs/PERFORMANCE.md). The fused formulation has
NO device-side reshapes: the host (or one device gather) supplies
phase-grouped frames and the device runs ``n_phases`` GEMMs straight into the
MXU.

The phase structure: with resampler output block size ``p`` (320 samples for
22 050->16 000) and hop ``h`` (1000), every ``n_ph = lcm(p, h)/h`` frames the
alignment between frame boundaries and polyphase blocks repeats (8 frames =
8000 output samples = 25 input blocks = 11 025 raw samples). Frame
``f = n_ph*g + r`` therefore reads the fixed raw-input window
``x[span*g + off_r : span*g + off_r + F]`` through a per-phase combined
matrix ``C_r = A_r @ W`` where ``A_r`` is the local resample operator and
``W`` the window-folded DFT (float64 host precompute).
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .frontend import dft_power_matrix, hann_window
from .resample import sinc_resample_kernel


@functools.lru_cache(maxsize=8)
def get_fused_frame_dft(
    orig_freq: int,
    new_freq: int,
    n_fft: int,
    hop: int,
    win_length: int,
    n_frames: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
) -> "FusedFrameDFT":
    """Cached constructor: the float64 per-phase matrix precompute costs
    seconds on a 1-core host, and CLIs otherwise build it twice (once inside
    the model's frontend, once for the host framer). Instances are immutable
    after init, so sharing is safe."""
    return FusedFrameDFT(
        orig_freq, new_freq, n_fft, hop, win_length, n_frames,
        lowpass_filter_width, rolloff,
    )


class FusedFrameDFT:
    """Precomputed phase-grouped resample+frame+DFT operator.

    ``__call__`` maps phase-grouped raw frames
    ``(B, n_ph, n_groups, frame_len)`` -> power spectrogram
    ``(B, n_frames, n_freq)`` (frame order restored).
    """

    def __init__(
        self,
        orig_freq: int,
        new_freq: int,
        n_fft: int,
        hop: int,
        win_length: int,
        n_frames: int,
        lowpass_filter_width: int = 6,
        rolloff: float = 0.99,
    ):
        if hop != n_fft:
            raise ValueError("fused frontend requires hop == n_fft (no overlap)")
        self.orig_freq, self.new_freq = int(orig_freq), int(new_freq)
        self.n_fft, self.hop = int(n_fft), int(hop)
        self.n_freq = n_fft // 2 + 1
        self.n_frames = int(n_frames)

        # window-folded DFT (float64), identical construction to MelBranch
        window = np.zeros(n_fft, dtype=np.float64)
        w = hann_window(win_length, periodic=True, dtype=np.float64)
        off = (n_fft - win_length) // 2
        window[off : off + win_length] = w
        W = dft_power_matrix(n_fft, window, dtype=np.float64)  # (n_fft, 2*n_freq)

        g = math.gcd(self.orig_freq, self.new_freq)
        q, p = self.orig_freq // g, self.new_freq // g

        if self.orig_freq == self.new_freq:
            # no resample: one phase, frames are plain hop-strided windows
            self.n_ph, self.span, self.width = 1, self.hop, 0
            self.frame_len = self.n_fft
            self.offsets = np.array([0], np.int64)
            # keep host numpy: instances are lru_cached and may first be
            # constructed inside a jit trace — a device array created there
            # leaks as a tracer-era constant into later traces
            self.c = W.astype(np.float32)[None]  # (1, n_fft, 2F)
        else:
            kernel, width = sinc_resample_kernel(
                orig_freq, new_freq, lowpass_filter_width, rolloff, dtype=np.float64
            )  # (p, 2*width + q); y[p*b + ph] = sum_t xpad[q*b + t] * kernel[ph, t]
            self.width = width
            n_ph = (p * hop) // math.gcd(p, hop) // hop  # frames per phase group
            if self.n_frames % n_ph:
                raise ValueError(
                    f"n_frames={n_frames} not divisible by phase count {n_ph}"
                )
            self.n_ph = n_ph
            blocks_per_group = n_ph * hop // p  # input blocks per group
            self.span = blocks_per_group * q  # raw samples per group

            taps = kernel.shape[1]
            offs, mats = [], []
            frame_len = 0
            for r in range(n_ph):
                m0 = r * hop  # first output sample of the phase-r frame
                b_lo = m0 // p
                b_hi = (m0 + hop - 1) // p
                flen = (b_hi - b_lo) * q + taps
                frame_len = max(frame_len, flen)
                # offset of the window in padded raw input: xpad has `width`
                # zeros prepended, so raw offset q*b_lo - width maps to
                # padded offset q*b_lo
                offs.append(b_lo * q)
                c = np.zeros((flen, W.shape[1]), np.float64)
                for u in range(hop):
                    m = m0 + u
                    b, ph = divmod(m, p)
                    lo = (b - b_lo) * q
                    c[lo : lo + taps] += kernel[ph][:, None] * W[u][None, :]
                mats.append(c)
            if frame_len > self.span:
                # frame_host's per-phase contiguous-reshape trick and the
                # native framers (native/audio_io.cpp ayt_frame_i16 /
                # ayt_load_batch_framed_i16) both assume windows of one phase
                # never overlap. Integer-upsampling configs (e.g. 8k->16k with
                # hop 1000: span 500 < frame_len ~514) violate it — the numpy
                # path would silently truncate frames and the C path reads
                # past its padded buffer. Refuse; SpectralFrontend catches
                # ValueError and falls back to the standard (unfused) path.
                raise ValueError(
                    f"fused frontend requires frame_len <= span (non-overlapping "
                    f"phase windows); got frame_len={frame_len} > span={self.span} "
                    f"for {orig_freq}->{new_freq}, hop={hop}"
                )
            self.frame_len = frame_len
            self.offsets = np.asarray(offs, np.int64)
            padded = np.zeros((n_ph, frame_len, W.shape[1]), np.float64)
            for r, c in enumerate(mats):
                padded[r, : c.shape[0]] = c
            self.c = padded.astype(np.float32)  # host numpy (see above)

        self.n_groups = self.n_frames // self.n_ph

    # ---- host-side framing ------------------------------------------------

    @property
    def padded_length(self) -> int:
        """Raw-sample length after edge padding that framing reads from."""
        need = (self.n_groups - 1) * self.span + int(self.offsets.max()) + self.frame_len
        return need

    def frame_host(self, x: np.ndarray) -> np.ndarray:
        """(..., L) raw audio -> (..., n_ph, n_groups, frame_len), any dtype.

        Zero-pads ``width`` samples left (the resampler's convolution context)
        and whatever the final windows need on the right. Windows of one phase
        never overlap (frame_len <= span), so each phase is a contiguous
        reshape view + tail slice; the single copy happens in ``np.stack`` —
        ~60 ms for a 32-clip fp32 batch on one core, overlapped by the
        loader's prefetch thread. int16 batches take the native C memcpy loop
        when the library is built (data/native.py::frame_i16).
        """
        if x.ndim == 2 and x.dtype == np.int16:
            from ..data import native

            if native._load() is not None and hasattr(native._load(), "ayt_frame_i16"):
                return native.frame_i16(x, self)
        lead = x.shape[:-1]
        L = x.shape[-1]
        # per-phase reshape needs off_r + n_groups*span samples
        need = int(self.offsets.max()) + self.n_groups * self.span
        xp = np.pad(x, [(0, 0)] * len(lead) + [(self.width, max(0, need - self.width - L))])
        phases = [
            xp[..., off : off + self.n_groups * self.span]
            .reshape(lead + (self.n_groups, self.span))[..., : self.frame_len]
            for off in self.offsets
        ]
        return np.stack(phases, axis=-3)  # (..., n_ph, n_groups, frame_len)

    def frame_device(self, x: jax.Array) -> jax.Array:
        """Device-side framing fallback (one gather) for waveform inputs."""
        lead = x.shape[:-1]
        L = x.shape[-1]
        pad_r = max(0, self.padded_length - self.width - L)
        xp = jnp.pad(x, [(0, 0)] * len(lead) + [(self.width, pad_r)])
        starts = jnp.asarray(self.offsets)[:, None] + (
            jnp.arange(self.n_groups)[None, :] * self.span
        )
        idx = starts[..., None] + jnp.arange(self.frame_len)[None, None, :]
        return jnp.take(xp, idx, axis=-1)

    # ---- int8 DFT GEMM -----------------------------------------------------

    def int8_matrix(self):
        """Per-frequency-column symmetric int8 quantization of the combined
        window-DFT(-resampler) matrix: ``(c_i8 (n_ph, F, 2*n_freq) int8,
        s_k (n_freq,) f32)`` with one shared scale per re/im column pair so
        ``s_k**2`` folds into the mel filterbank rows (frontend.py).

        The DFT GEMM is the model's largest op and the v5e MXU runs int8 at
        2x its bf16 rate. Quantization error per output bin is a dot of
        ~frame_len terms each with |err| <= absmax/254 against bounded
        inputs — relative spectrum error ~1e-3, before log-mel compression.
        """
        if not hasattr(self, "_c_i8"):
            c = np.asarray(self.c, np.float64)  # (n_ph, F, 2*n_freq)
            nf = self.n_freq
            colmax = np.abs(c).max(axis=(0, 1))  # (2*n_freq,)
            s_k = np.maximum(np.maximum(colmax[:nf], colmax[nf:]), 1e-30) / 127.0
            sc = np.concatenate([s_k, s_k])
            self._c_i8 = np.clip(np.round(c / sc), -127, 127).astype(np.int8)
            self._sk = s_k.astype(np.float32)
        return self._c_i8, self._sk

    def power_int8(self, q: jax.Array, storage_dtype=None) -> jax.Array:
        """int8 framed input -> UNSCALED phase-order power spectrum.

        ``q``: (B, n_ph, n_groups, frame_len) int8 (host-quantized frames,
        e.g. ``SpectralFrontend.frame_host_int8``). Returns
        (B, n_ph, n_groups, n_freq) f32 equal to the true power spectrum
        divided by ``(s_clip * s_k)**2`` — the caller folds ``s_k**2`` into
        the mel matrix and ``s_clip**2`` into the (15x smaller) mel output.
        int8 x int8 -> int32 on the MXU; exact integer accumulation
        (max |acc| ~ 127*127*frame_len << 2^31).

        ``storage_dtype=jnp.bfloat16``: materialize the GEMM accumulator in
        bf16 instead of int32 (the convert rides the GEMM epilogue) — the
        (B, n_ph, G, 2*n_freq) spectrum is the biggest intermediate of the
        whole model (~0.5 GB at B=128) and the step around it is
        HBM-bound. Adds ~2^-9 relative rounding on amplitudes (~0.4% on
        power) on top of the int8 matrix quantization's ~0.1%;
        accuracy-gate before adopting (tools/gate_int8_transfer.py
        protocol).
        """
        c_i8, _ = self.int8_matrix()
        acc = jnp.einsum(
            "brgf,rfk->brgk", q, jnp.asarray(c_i8),
            preferred_element_type=jnp.int32,
        )
        if storage_dtype is not None:
            acc = acc.astype(storage_dtype)
        af = acc.astype(jnp.float32)
        nf = self.n_freq
        return af[..., :nf] ** 2 + af[..., nf:] ** 2

    # ---- device compute ----------------------------------------------------

    def reorder_frames(self, x: jax.Array) -> jax.Array:
        """(B, n_ph, n_groups, C) phase-ordered -> (B, n_frames, C) in time
        order (frame f = g*n_ph + r)."""
        return jnp.swapaxes(x, 1, 2).reshape(x.shape[0], self.n_frames, x.shape[-1])

    def __call__(self, framed: jax.Array, power: float = 2.0,
                 precision=jax.lax.Precision.HIGHEST,
                 reorder: bool = True, storage_dtype=None) -> jax.Array:
        """(B, n_ph, n_groups, frame_len) -> power spectrogram:
        (B, n_frames, n_freq) when ``reorder`` (time order), else the raw
        (B, n_ph, n_groups, n_freq) phase order. Callers that project to mel
        first should pass ``reorder=False`` and call :meth:`reorder_frames`
        on the (15x smaller) mel tensor — the frame permutation commutes
        with the freq-axis contraction, and profiling showed the pre-mel
        transpose costing 2.5 ms of pure data movement at B=256.

        int types are dequantized as PCM16 (x/32768) like the WAV readers.

        ``storage_dtype=jnp.bfloat16``: run the DFT GEMM with bf16 operands
        AND a bf16-stored spectrum. The DFT GEMM is the model's single
        biggest op (59% of model FLOPs; ~1 GB of f32 spectrum written+reread
        per 256-clip batch) and this fusion is memory/compute co-bound —
        with ``Precision.DEFAULT`` the MXU already rounds the operands to
        bf16 per pass, so the only numerics added is the output-store
        rounding; the power accumulate below upcasts back to f32.
        """
        if jnp.issubdtype(framed.dtype, jnp.integer):
            framed = framed.astype(jnp.float32) * (1.0 / 32768.0)
        framed = framed.astype(jnp.float32)
        c = jnp.asarray(self.c)
        out_dt = jnp.float32
        if storage_dtype is not None:
            framed = framed.astype(storage_dtype)
            c = c.astype(storage_dtype)
            out_dt = storage_dtype
        # one GEMM per phase: (B, G, F) @ (F, 2*n_freq)
        spec = jnp.einsum(
            "brgf,rfk->brgk", framed, c,
            preferred_element_type=out_dt,
            precision=precision,
        )
        nf = self.n_freq
        spec_f = spec.astype(jnp.float32)
        p = spec_f[..., :nf] ** 2 + spec_f[..., nf:] ** 2  # (B, n_ph, G, n_freq)
        if reorder:
            p = self.reorder_frames(p)
        if power == 2.0:
            return p
        if power == 1.0:
            return jnp.sqrt(p)
        return p ** (power / 2.0)
