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
        # conv_general_dilated wants (out_ch=P, in_ch=1, taps)
        self.kernel = jnp.asarray(kernel)[:, None, :]

    def output_length(self, length: int) -> int:
        return int(math.ceil(self.new_freq * length / self.orig_freq))

    def __call__(self, x: jax.Array) -> jax.Array:
        """Resample along the last axis. ``x``: (..., time) float array."""
        if self.orig_freq == self.new_freq:
            return x
        in_shape = x.shape
        length = in_shape[-1]
        xf = x.reshape((-1, 1, length)).astype(jnp.float32)
        xf = jnp.pad(xf, ((0, 0), (0, 0), (self.width, self.width + self.q)))
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
        return y.reshape(in_shape[:-1] + (y.shape[-1],)).astype(x.dtype)


@partial(jax.jit, static_argnums=(1, 2))
def resample(x: jax.Array, orig_freq: int, new_freq: int) -> jax.Array:
    """One-shot functional form (kernel folded as a compile-time constant)."""
    return Resampler(orig_freq, new_freq)(x)
