"""Pallas TPU kernel: phase-grouped DFT + power + mel in one VMEM pass.

The fused frontend (ops/fused_frontend.py) lowers to two XLA GEMMs with a
power-spectrum elementwise stage between them:

    spec = framed @ C_r          # (B, n_ph, G, 2*n_freq)  — ~1 GB f32 at B=256
    mel  = (re^2 + im^2) @ M     # (B, n_ph, G, n_mels)

XLA materializes ``spec`` in HBM (written by the DFT GEMM fusion, read back by
the mel GEMM) because it cannot fuse across two matmuls. At B=256 that
round-trip is ~2 GB of HBM traffic — ~2.4 ms at v5e's 819 GB/s, on top of a
DFT GEMM that is already ~67% of bf16 MXU peak (profiled, docs/PERFORMANCE.md).

This kernel keeps the per-(clip, phase) spectrum tile entirely in VMEM:

    grid (n_ph, B); per cell:  x (G, F) -> spec (G, 2F') -> sq -> mel (G, n_mels)

Only the framed input is read and only the mel output (~120x smaller than
``spec``) is written. The per-phase combined matrix ``C_r`` (bf16, ~3.6 MB)
stays VMEM-resident across the whole batch sweep (phase is the outer, slowest
grid axis). The power trick: ``re^2+im^2 @ M`` == ``spec^2 @ [M; M]`` — squaring
ALL 2*n_freq lanes and doubling the filterbank avoids an in-kernel minor-dim
slice at the (non-lane-aligned) n_freq boundary, which the Mosaic remote
compiler rejects.

Numerics match the ``frontend_precision: default`` posture (bf16 GEMM inputs,
f32 accumulation); the fp32 ``highest`` parity posture keeps the XLA path.
The frontend has no trainable parameters and sits upstream of all of them, so
no VJP ever flows through it.

**Measured result (v5e, B=256): NEGATIVE — kept opt-in, default off.**
End-to-end inference 21.5 ms vs 17.7 ms for the XLA path; segment-only 15.4 ms
as written, 12.6 ms with every dim padded to lane multiples (F 1782->1792,
2*n_freq 1002->1024, n_mels 32->128) vs 12.1 ms for XLA's GEMM pair. The
stage is MXU-compute-bound (877 GFLOP at B=256), detection events still match
(valid-mask agreement 99.8%, conf within bf16 noise), but Mosaic's matmul
codegen trails XLA's batched-GEMM schedule by more than the ~2 GB HBM
round-trip saves. Full numbers: docs/PERFORMANCE.md "negative results".

Reference surface replaced: torchaudio MelSpectrogram inside the reference's
frontend chain (``modules/_architecture.py:84-108``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, c_ref, m_ref, o_ref):
    # x: (1, 1, G, F) f32/int16 block; c: (1, F, 2F') bf16; m: (2F', M) bf16
    x = x_ref[0, 0].astype(jnp.bfloat16)
    spec = jnp.dot(x, c_ref[0], preferred_element_type=jnp.float32)
    sq = (spec * spec).astype(jnp.bfloat16)
    o_ref[0, 0] = jnp.dot(sq, m_ref[:], preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_mel_power(framed: jax.Array, c: jax.Array, mel2: jax.Array,
                    interpret: bool = False) -> jax.Array:
    """(B, n_ph, G, F) frames -> (B, n_ph, G, n_mels) mel power (phase order).

    ``c``: (n_ph, F, 2*n_freq) bf16 combined resample+window+DFT matrices with
    any PCM dequant scale folded in; ``mel2``: (2*n_freq, n_mels) bf16 doubled
    filterbank ``[M; M]``.
    """
    B, R, G, F = framed.shape
    K2 = c.shape[-1]
    M = mel2.shape[-1]
    return pl.pallas_call(
        _kernel,
        grid=(R, B),  # last axis fastest: phase r outer => C_r fetched R times
        in_specs=[
            pl.BlockSpec((1, 1, G, F), lambda r, b: (b, r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F, K2), lambda r, b: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, G, M), lambda r, b: (b, r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, R, G, M), jnp.float32),
        interpret=interpret,
    )(framed, c, mel2)


class PallasMelFrontend:
    """Holds the host-precomputed bf16 constants for :func:`fused_mel_power`.

    Built from a ``FusedFrameDFT`` + mel filterbank; ``__call__`` maps framed
    input straight to phase-ordered mel power. int16 frames are dequantized by
    folding 1/32768 into the combined matrix (free — it is a constant).
    """

    def __init__(self, fused, mel_fb: np.ndarray):
        # Host numpy here (instances may be built inside a trace — see
        # FusedFrameDFT.c note); jnp constants are embedded at trace time via
        # the jitted fused_mel_power, so they are device-put exactly once per
        # compiled program. Do NOT device_put per call: 30 MB through the
        # tunnel per invocation would cost more than the kernel saves.
        self.c = np.asarray(fused.c, np.float32)
        self.c_i16 = (self.c * (1.0 / 32768.0)).astype(jnp.bfloat16)
        self.c = self.c.astype(jnp.bfloat16)
        fb = np.asarray(mel_fb, np.float32)  # (n_freq, n_mels)
        self.mel2 = np.concatenate([fb, fb], axis=0).astype(jnp.bfloat16)
        self.n_mels = fb.shape[1]
        # VMEM budget (16 MB/core): x block + double-buffered C_r + mel2 +
        # spec intermediate must fit; refuse configs that cannot.
        G = fused.n_groups
        F = fused.frame_len
        K2 = self.c.shape[-1]
        vmem = (2 * G * F * 4) + (2 * F * K2 * 2) + (K2 * self.n_mels * 2) \
            + (G * K2 * 4) + (G * K2 * 2) + (2 * G * self.n_mels * 4)
        self.ok = vmem < 14 * 1024 * 1024  # headroom under the 16 MB budget

    def __call__(self, framed: jax.Array, interpret: bool = False) -> jax.Array:
        c = self.c_i16 if jnp.issubdtype(framed.dtype, jnp.integer) else self.c
        return fused_mel_power(framed, jnp.asarray(c), jnp.asarray(self.mel2),
                               interpret=interpret)
