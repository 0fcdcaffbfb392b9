"""ctypes bindings for the native C++ audio ingestion library.

Loads ``native/libayt_audio.so`` (built by ``make -C native``; auto-built on
first use when a compiler is available) and exposes:

- :func:`native_available` — probe;
- :func:`read_mono` — one span, mono-downmixed float32, zero-padded;
- :func:`load_batch` — N spans decoded in parallel C++ threads straight into
  one contiguous ``(N, out_len)`` float32 buffer (the hot ingestion path that
  replaces per-item Python decode in ``BatchLoader``).

Scaling conventions are bit-identical to the numpy reader in ``wavio.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_LIB_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_LIB_DIR, "libayt_audio.so")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH) and os.path.exists(
            os.path.join(_LIB_DIR, "audio_io.cpp")
        ):
            try:
                subprocess.run(
                    ["make", "-C", _LIB_DIR], check=True, capture_output=True, timeout=120
                )
            except Exception:
                return None
        if not os.path.exists(_LIB_PATH):
            return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError:
            return None
        lib.ayt_wav_info.restype = ctypes.c_int
        lib.ayt_wav_info.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
        ]
        lib.ayt_read_mono.restype = ctypes.c_int64
        lib.ayt_read_mono.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
        ]
        lib.ayt_load_batch.restype = ctypes.c_int
        lib.ayt_load_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int32,
        ]
        if hasattr(lib, "ayt_load_batch_i16"):
            lib.ayt_load_batch_i16.restype = ctypes.c_int
            lib.ayt_load_batch_i16.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64, ctypes.c_int32,
            ]
        if hasattr(lib, "ayt_frame_i16"):
            lib.ayt_frame_i16.restype = ctypes.c_int
            lib.ayt_frame_i16.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int32, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int16),
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ]
        if hasattr(lib, "ayt_quant_i8"):
            lib.ayt_quant_i8.restype = ctypes.c_int
            lib.ayt_quant_i8.argtypes = [
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int32, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int8), ctypes.POINTER(ctypes.c_float),
                ctypes.c_int32,
            ]
        if hasattr(lib, "ayt_load_batch_framed_i16"):
            lib.ayt_load_batch_framed_i16.restype = ctypes.c_int
            lib.ayt_load_batch_framed_i16.argtypes = [
                ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int16), ctypes.c_int64,
                ctypes.c_int32, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int32,
            ]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def wav_info(path: str) -> Tuple[int, int, int]:
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    rate = ctypes.c_int32()
    frames = ctypes.c_int64()
    channels = ctypes.c_int32()
    rc = lib.ayt_wav_info(path.encode(), ctypes.byref(rate), ctypes.byref(frames), ctypes.byref(channels))
    if rc != 0:
        raise IOError(f"native wav_info failed for {path} (code {rc})")
    return rate.value, frames.value, channels.value


def read_mono(path: str, frame_offset: int, num_frames: int, out_len: int) -> np.ndarray:
    """Decode one span, mono-downmixed, zero-padded to ``out_len``."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    out = np.zeros(out_len, np.float32)
    rc = lib.ayt_read_mono(
        path.encode(), frame_offset, num_frames,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), out_len,
    )
    if rc < 0:
        raise IOError(f"native read failed for {path} (code {rc})")
    return out


def load_batch(
    paths: Sequence[str],
    frame_offsets: Sequence[int],
    num_frames: Sequence[int],
    out_len: int,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode N spans in parallel into a contiguous (N, out_len) buffer."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native audio library unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_len), np.float32)
    assert out.shape == (n, out_len) and out.dtype == np.float32 and out.flags.c_contiguous
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    offs = np.asarray(frame_offsets, np.int64)
    cnts = np.asarray(num_frames, np.int64)
    rc = lib.ayt_load_batch(
        c_paths, n,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out_len, n_threads,
    )
    if rc != 0:
        raise IOError(f"native batch load failed (code {rc})")
    return out


def framed_available() -> bool:
    lib = _load()
    return lib is not None and hasattr(lib, "ayt_load_batch_framed_i16")


def load_batch_i16(
    paths: Sequence[str],
    frame_offsets: Sequence[int],
    num_frames: Sequence[int],
    out_len: int,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode N spans to raw int16 waveforms ``(N, out_len)`` — the
    minimum-byte host->device layout (mono PCM16 is fread directly)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ayt_load_batch_i16"):
        raise RuntimeError("native int16 loader unavailable")
    n = len(paths)
    if out is None:
        out = np.empty((n, out_len), np.int16)
    assert out.shape == (n, out_len) and out.dtype == np.int16 and out.flags.c_contiguous
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    offs = np.asarray(frame_offsets, np.int64)
    cnts = np.asarray(num_frames, np.int64)
    rc = lib.ayt_load_batch_i16(
        c_paths, n,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        out_len, n_threads,
    )
    if rc != 0:
        raise IOError(f"native int16 batch load failed (code {rc})")
    return out


def frame_i16(clips: np.ndarray, framer, n_threads: int = 2) -> np.ndarray:
    """Phase-group an in-memory int16 batch ``(B, clip_len)`` into
    ``(B, n_ph, n_groups, frame_len)`` with the C memcpy loop (the streaming
    evaluator's framing step). ``framer`` is a FusedFrameDFT."""
    lib = _load()
    if lib is None or not hasattr(lib, "ayt_frame_i16"):
        raise RuntimeError("native framing unavailable")
    assert clips.ndim == 2 and clips.dtype == np.int16
    clips = np.ascontiguousarray(clips)
    n, clip_len = clips.shape
    out = np.empty((n, framer.n_ph, framer.n_groups, framer.frame_len), np.int16)
    phase_offs = np.asarray(framer.offsets, np.int64)
    rc = lib.ayt_frame_i16(
        clips.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, clip_len,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        framer.n_ph, framer.n_groups, framer.frame_len, framer.span,
        phase_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        framer.width, n_threads,
    )
    if rc != 0:
        raise IOError(f"native framing failed (code {rc})")
    return out


def quant_i8(clips: np.ndarray, n_threads: int = 2):
    """Per-clip symmetric int8 quantization of an int16 batch ``(B, L)`` (any
    trailing layout — flattened per clip): returns ``(q int8 same-shape,
    step f32 (B,))`` with ``step`` in int16 units (``q * step`` reproduces
    the int16 samples to half a step; numpy-round parity). The C loop is
    ~8x the 1-core numpy version on 80 MB half-hours — the difference
    between int8 transfer winning and losing on a fast pipe
    (docs/PERFORMANCE.md)."""
    lib = _load()
    if lib is None or not hasattr(lib, "ayt_quant_i8"):
        raise RuntimeError("native int8 quantization unavailable")
    assert clips.dtype == np.int16
    clips = np.ascontiguousarray(clips)
    n = clips.shape[0]
    clip_len = int(clips.size // max(n, 1))
    q = np.empty(clips.shape, np.int8)
    step = np.empty(n, np.float32)
    rc = lib.ayt_quant_i8(
        clips.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)), n, clip_len,
        q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        step.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_threads,
    )
    if rc != 0:
        raise IOError(f"native int8 quantization failed (code {rc})")
    return q, step


def load_batch_framed_i16(
    paths: Sequence[str],
    frame_offsets: Sequence[int],
    num_frames: Sequence[int],
    clip_len: int,
    framer,
    n_threads: int = 4,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Decode N spans straight into the fused frontend's phase-grouped int16
    frame layout ``(N, n_ph, n_groups, frame_len)`` — the device-ready
    training/inference input (see ops/fused_frontend.py::FusedFrameDFT).
    ``framer`` is a FusedFrameDFT. Mono PCM16 files are read as raw int16
    with zero decode work; other formats quantize exactly like the numpy
    loader path."""
    lib = _load()
    if lib is None or not hasattr(lib, "ayt_load_batch_framed_i16"):
        raise RuntimeError("native framed loader unavailable")
    n = len(paths)
    shape = (n, framer.n_ph, framer.n_groups, framer.frame_len)
    if out is None:
        out = np.empty(shape, np.int16)
    assert out.shape == shape and out.dtype == np.int16 and out.flags.c_contiguous
    c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in paths])
    offs = np.asarray(frame_offsets, np.int64)
    cnts = np.minimum(np.asarray(num_frames, np.int64), clip_len)
    phase_offs = np.asarray(framer.offsets, np.int64)
    rc = lib.ayt_load_batch_framed_i16(
        c_paths, n,
        offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        cnts.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        clip_len,
        framer.n_ph, framer.n_groups, framer.frame_len, framer.span,
        phase_offs.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        framer.width, n_threads,
    )
    if rc != 0:
        raise IOError(f"native framed batch load failed (code {rc})")
    return out
