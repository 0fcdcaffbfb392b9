"""Resampler numerics: direct float64 windowed-sinc evaluation as oracle."""

import math

import numpy as np
import jax.numpy as jnp

from audioyolo_tpu.ops.resample import Resampler, sinc_resample_kernel


def _direct_sinc_resample(x, orig, new, lowpass_width=6, rolloff=0.99):
    """Naive O(N*T) evaluation of windowed-sinc interpolation in float64."""
    g = math.gcd(orig, new)
    q, p = orig // g, new // g
    base = min(q, p) * rolloff
    width = int(math.ceil(lowpass_width * q / base))
    out_len = int(math.ceil(new * len(x) / orig))
    y = np.zeros(out_len)
    for i in range(out_len):
        blk, ph = divmod(i, p)
        tau = blk * q + ph * q / p  # output time in input-sample units
        j0 = blk * q
        for j in range(j0 - width, j0 + width + q):
            # position of input sample j relative to the output time, in
            # periods of the anti-aliasing lowpass
            u = (j - tau) / q * base
            if u < -lowpass_width or u > lowpass_width:
                continue
            win = math.cos(u * math.pi / lowpass_width / 2) ** 2
            s = 1.0 if u == 0 else math.sin(math.pi * u) / (math.pi * u)
            if 0 <= j < len(x):
                y[i] += x[j] * s * win * (base / q)
    return y


def test_kernel_shape_and_dc_gain():
    k, width = sinc_resample_kernel(22050, 16000)
    assert k.shape == (320, 2 * width + 441)
    # Each polyphase branch must pass DC at unit gain (sum of taps ~= 1).
    np.testing.assert_allclose(k.sum(axis=1), np.ones(320), atol=5e-3)


def test_matches_direct_evaluation(rng):
    x = rng.standard_normal(2000).astype(np.float64)
    rs = Resampler(441, 320)  # 22050:16000 reduced — same kernel, small input
    ours = np.asarray(rs(jnp.asarray(x.astype(np.float32))[None])[0])
    ref = _direct_sinc_resample(x, 441, 320)
    assert len(ours) == len(ref)
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_sine_preserved(rng):
    # A 1 kHz tone resampled 22050 -> 16000 must stay a 1 kHz tone.
    sr0, sr1, f = 22050, 16000, 1000.0
    t = np.arange(sr0) / sr0
    x = np.sin(2 * np.pi * f * t).astype(np.float32)
    y = np.asarray(Resampler(sr0, sr1)(jnp.asarray(x)[None])[0])
    assert y.shape[0] == sr1
    t1 = np.arange(sr1) / sr1
    expected = np.sin(2 * np.pi * f * t1)
    # ignore filter edge transients
    sl = slice(200, -200)
    np.testing.assert_allclose(y[sl], expected[sl], atol=5e-3)


def test_identity_when_rates_equal(rng):
    x = jnp.asarray(rng.standard_normal(500).astype(np.float32))[None]
    y = Resampler(16000, 16000)(x)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_batch_shapes(rng):
    x = jnp.asarray(rng.standard_normal((3, 1, 4410)).astype(np.float32))
    y = Resampler(22050, 16000)(x)
    assert y.shape == (3, 1, 3200)
