"""Band-limited sinc resampling as a strided convolution (MXU-friendly).

Implements windowed-sinc interpolation with the same numerics as
``torchaudio.transforms.Resample`` (``sinc_interp_hann``, lowpass_filter_width=6,
rolloff=0.99) — the frontend op used by the reference at
``modules/_architecture.py:25-28`` and ``inference.py:156-162`` — but expressed
TPU-natively: the polyphase filter bank is a precomputed ``(P, T)`` constant and
the whole resample is one ``lax.conv_general_dilated`` with window stride
``orig/gcd``, which XLA lowers to an implicit GEMM on the MXU.

The kernel is derived from the standard polyphase decomposition (public DSP
math), not from any library source: for output phase ``p`` of ``P = new/g``
phases the ideal filter tap at integer offset ``j`` is
``scale * sinc(base_freq * (j - p/P' ...))`` windowed by a raised cosine.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def sinc_resample_kernel(
    orig_freq: int,
    new_freq: int,
    lowpass_filter_width: int = 6,
    rolloff: float = 0.99,
    dtype=np.float32,
) -> Tuple[np.ndarray, int]:
    """Build the polyphase windowed-sinc filter bank.

    Returns ``(kernel, width)`` where ``kernel`` has shape
    ``(P, 2*width + Q)`` with ``P = new/g`` output phases and ``Q = orig/g``
    the input stride, and ``width`` is the per-side context in input samples.
    """
    if orig_freq <= 0 or new_freq <= 0:
        raise ValueError("sample rates must be positive")
    g = math.gcd(int(orig_freq), int(new_freq))
    q = int(orig_freq) // g  # input stride per output block
    p = int(new_freq) // g  # output phases per block

    # Cutoff of the anti-aliasing lowpass: rolloff * Nyquist of the lower rate.
    base_freq = min(q, p) * rolloff
    width = int(math.ceil(lowpass_filter_width * q / base_freq))

    # For output sample with phase i (time i/p in units of input samples),
    # filter taps sit at integer input positions idx in [-width, width + q).
    idx = np.arange(-width, width + q, dtype=np.float64) / q  # in input-period units
    phase_t = -np.arange(p, dtype=np.float64)[:, None] / p + idx[None, :]
    t = phase_t * base_freq
    t = np.clip(t, -lowpass_filter_width, lowpass_filter_width)

    # Hann (raised-cosine) window over the truncated sinc support.
    window = np.cos(t * np.pi / lowpass_filter_width / 2) ** 2
    t = t * np.pi
    kernel = np.where(t == 0, 1.0, np.sin(t) / np.where(t == 0, 1.0, t))
    kernel = kernel * window * (base_freq / q)
    return kernel.astype(dtype), width


class Resampler:
    """Stateless resampler; precomputes the filter constant once per rate pair."""

    def __init__(
        self,
        orig_freq: int,
        new_freq: int,
        lowpass_filter_width: int = 6,
        rolloff: float = 0.99,
    ):
        self.orig_freq = int(orig_freq)
        self.new_freq = int(new_freq)
        g = math.gcd(self.orig_freq, self.new_freq)
        self.q = self.orig_freq // g
        self.p = self.new_freq // g
        kernel, width = sinc_resample_kernel(
            orig_freq, new_freq, lowpass_filter_width, rolloff
        )
        self.width = width
        # (K, P) kernel, K = 2*width + q taps per block, split into two row
        # bands on the q-grid: rows [0, q) multiply the current q-sample block
        # row, rows [q, q+2w) multiply the first 2w samples of the next row.
        kkp = kernel.T  # (K, P)
        self.kernel_a = jnp.asarray(kkp[: self.q])  # (q, P)
        self.kernel_b = jnp.asarray(kkp[self.q :])  # (2w, P)
        # conv layout kept for the fallback path: (out_ch=P, in_ch=1, taps)
        self.kernel = jnp.asarray(kernel)[:, None, :]

    def output_length(self, length: int) -> int:
        return int(math.ceil(self.new_freq * length / self.orig_freq))

    def __call__(self, x: jax.Array) -> jax.Array:
        """Resample along the last axis. ``x``: (..., time) float array.

        TPU-first formulation: instead of a stride-``q`` conv (which XLA
        lowers poorly for strides in the hundreds), the signal is viewed as
        ``q``-sample rows via a reshape, each polyphase block's ``2*width``
        overlap is borrowed from the next row with a slice+concat, and the
        whole resample becomes one ``(blocks, K) @ (K, P)`` GEMM on the MXU.
        """
        if self.orig_freq == self.new_freq:
            return x
        in_shape = x.shape
        length = in_shape[-1]
        q, w, p = self.q, self.width, self.p
        xf = x.reshape((-1, length)).astype(jnp.float32)

        if 2 * w > q:
            return self._conv_fallback(xf, length, in_shape, x.dtype)

        nblocks = length // q + 1
        pad_right = (nblocks + 1) * q - w - length
        xlp = jnp.pad(xf, ((0, 0), (w, pad_right)))
        rows = xlp.reshape(xf.shape[0], nblocks + 1, q)
        # Two-band decomposition: the wide GEMM operand is a pure reshape view
        # (no overlap materialization), the 2w-tap correction is a small slice.
        mm = lambda a, b: jnp.matmul(  # noqa: E731
            a, b, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        y = mm(rows[:, :nblocks], self.kernel_a) + mm(rows[:, 1:, : 2 * w], self.kernel_b)

        target = self.output_length(length)
        if target % p == 0:
            y = y[:, : target // p, :].reshape(xf.shape[0], target)
        else:
            y = y.reshape(xf.shape[0], -1)[:, :target]
        return y.reshape(in_shape[:-1] + (y.shape[-1],)).astype(x.dtype)

    def _conv_fallback(self, xf: jax.Array, length: int, in_shape, dtype) -> jax.Array:
        xf = jnp.pad(xf[:, None, :], ((0, 0), (0, 0), (self.width, self.width + self.q)))
        y = jax.lax.conv_general_dilated(
            xf,
            self.kernel,
            window_strides=(self.q,),
            padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # (N, P, blocks)
        y = jnp.swapaxes(y, 1, 2).reshape(y.shape[0], -1)
        y = y[:, : self.output_length(length)]
        return y.reshape(in_shape[:-1] + (y.shape[-1],)).astype(dtype)


@partial(jax.jit, static_argnums=(1, 2))
def resample(x: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """One-shot functional form (kernel folded as a compile-time constant)."""
    return Resampler(orig_freq, new_freq)(x)
