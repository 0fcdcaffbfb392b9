"""Long-form streaming evaluation (reference ``inference.py:113-209``).

Reads arbitrarily long audio in ``batch_size * sample_duration`` chunks,
windows each chunk into a batch of fixed 60 s clips, runs the jitted
detector+NMS graph, re-globalizes event times by clip offset, RLE-merges
consecutive same-class events, and writes one ``{start, end, class}`` CSV per
file. Chunk batches are padded to the full batch size so XLA compiles exactly
one shape.

Intended-behavior fixes over the reference (documented deviations):
- output directory nesting no longer crashes on deep paths
  (``inference.py:203`` compares a list to an int);
- the last partial chunk is masked out rather than producing phantom
  detections from all-zero padded clips (the padded clips still run through
  the model, but their rows are dropped).
"""

from __future__ import annotations

import math
import os
from datetime import timedelta
from typing import Callable, Dict, List, Optional

import numpy as np

from ..data.wavio import read_wav, read_wav_info, read_wav_pcm16_mono
from ..ops.resample import Resampler
from .decode import postprocess_detections


def quantize_clips_int8(clips: np.ndarray):
    """Per-clip symmetric int8 quantization of a clip batch for minimum-byte
    host->device transfer: ``(B, 1, S)`` int16 or float32 ->
    ``(q int8, scale f32 (B,))`` with ``q * scale`` reproducing the float
    waveform the int16/float path would feed the model (int16 sources keep
    the readers' ``/32768`` normalization folded into ``scale``).

    Streaming is transfer-bound on tunnelled deployments (docs/PERFORMANCE.md
    "transfer cliff"); int8 halves the int16 floor's bytes. Lossy (~48 dB
    SNR at per-clip absmax scaling) — detection-equivalence on the demo model
    is measured in docs/PERFORMANCE.md; lossless deployments keep int16.
    """
    if clips.dtype == np.int16:
        from ..data import native

        try:  # threaded C loop: ~8x the numpy path on the 1-core host
            q, step = native.quant_i8(clips)
            return q, (step / np.float32(32768.0)).astype(np.float32)
        except RuntimeError:  # library unavailable: numpy fallback below
            pass
        # abs() overflows on int16's -32768 — widen first
        a = np.abs(clips.astype(np.int32)).max(axis=(1, 2)).astype(np.float32)
        s = np.maximum(a, 1.0) / 127.0
        scale = s / np.float32(32768.0)
    else:
        a = np.abs(clips).max(axis=(1, 2)).astype(np.float32)
        s = np.maximum(a, np.float32(1e-12)) / 127.0
        scale = s
    q = np.clip(
        np.round(clips.astype(np.float32) / s[:, None, None]), -127, 127
    ).astype(np.int8)
    return q, scale.astype(np.float32)


_dev_quant = None


def quantize_clips_int8_device(clips):
    """Device-side mirror of :func:`quantize_clips_int8` for device-resident
    batches (``DeviceCachedLoader``-backed gates/evals): identical per-clip
    absmax semantics, computed in one jitted program with no device->host
    round trip. The only possible divergence from the host path is fp32
    reduction order in the absmax — at most 1 ulp on ``scale``, far below
    the ~48 dB quantization noise the gate measures."""
    global _dev_quant
    if _dev_quant is None:
        import jax
        import jax.numpy as jnp

        def _q(x):
            if x.dtype == jnp.int16:
                a = jnp.abs(x.astype(jnp.int32)).max(axis=(1, 2)).astype(jnp.float32)
                s = jnp.maximum(a, 1.0) / 127.0
                scale = s * (1.0 / 32768.0)
            else:
                a = jnp.abs(x).max(axis=(1, 2)).astype(jnp.float32)
                s = jnp.maximum(a, 1e-12) / 127.0
                scale = s
            q = jnp.clip(
                jnp.round(x.astype(jnp.float32) / s[:, None, None]), -127, 127
            ).astype(jnp.int8)
            return q, scale.astype(jnp.float32)

        _dev_quant = jax.jit(_q)
    return _dev_quant(clips)


def _prefetch_iter(gen, depth: int = 2):
    """Run a generator on a background thread, ``depth`` items ahead.

    The streaming hot path is transfer-bound (~45 MB/s journaled puts,
    docs/PERFORMANCE.md): with a serial loop the pipe idles while the host
    decodes + quantizes the next chunk. Producing chunks on a thread hides
    that host work under the in-flight transfer (WAV decode and the native
    int8 quantizer both release the GIL). ``device_put`` is thread-safe; the
    arrays cross threads as ordinary objects."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=depth)
    sentinel = object()
    stop = threading.Event()
    err: List[BaseException] = []

    def worker():
        try:
            for item in gen:
                # bounded put with a stop check: if the consumer abandons
                # iteration (infer_fn raised, generator closed) the producer
                # must not block forever holding device-resident chunks —
                # long-lived pool workers would leak a thread per failed call
                # (round-4 advisor)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as e:  # surfaced on the consumer thread
            err.append(e)
        finally:
            try:
                gen.close()  # release file handles promptly
            except Exception:
                pass
            while not stop.is_set():
                try:
                    q.put(sentinel, timeout=0.1)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:  # unblock a producer waiting on a full queue, drop chunk refs
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
        t.join(timeout=5.0)


def rle_merge(rows: List[dict]) -> List[dict]:
    """Merge consecutive same-class events (reference ``inference.py:186-195``:
    the merge is purely class-adjacency based — time gaps do not split)."""
    out: List[dict] = []
    for row in rows:
        if out and out[-1]["class"] == row["class"]:
            out[-1]["end"] = row["end"]
        else:
            out.append(dict(row))
    return out


def evaluate_audio(
    infer_fn: Callable,
    audio_filepath: str,
    output_dir: str,
    input_sample_rate: int,
    sample_duration: float,
    batch_size: int,
    idx2class_map: Dict[int, str],
    return_rows: bool = False,
    frame_fn: Optional[Callable] = None,
    _resampler_cache: Optional[dict] = None,
    chunk_range: Optional[tuple] = None,
    transfer: str = "int16",
) -> Optional[List[dict]]:
    """Stream one file through the detector; writes ``<name>_results.csv``.

    ``infer_fn``: jitted function (B, 1, S)@input_sample_rate -> detection dict
    (see decode.make_inference_fn). IoU/confidence thresholds are baked into
    the compiled function.

    ``frame_fn``: optional host framer (``SpectralFrontend.frame_host``) for
    the fused frontend path — clips are shipped as phase-grouped frames and
    the device runs pure GEMMs with no relayouts. Used when the file is
    already at ``input_sample_rate`` (otherwise the on-device rate conversion
    happens first and the waveform path is kept).

    ``chunk_range``: optional ``(c0, c1)`` — evaluate only chunks
    ``c0 <= c < c1`` (chunk = ``batch_size`` windows), with clip offsets kept
    *global*, so disjoint ranges from parallel worker processes concatenate
    into exactly the single-process row list (infer/pool.py shards long files
    this way: the host->device pipe's ~45 MB/s throughput cap is
    per-process, so K workers ingest at ~K x 45 MB/s — docs/PERFORMANCE.md).

    ``transfer``: "int16" (default — exact for PCM16 sources) or "int8"
    (half the bytes again; per-clip absmax scales via
    :func:`quantize_clips_int8`, dequantized in-graph — ``infer_fn`` must be
    built with ``make_inference_fn(int8_input=True)``). int8 requires
    native-rate files (no on-device resampling). With a ``frame_fn`` it must
    be the quantizing framer (``SpectralFrontend.frame_host_int8``): clips
    ship as framed-int8 ``(q, scale)`` tuples straight into the model's
    int8-DFT entry (``int8_input`` stays False on the infer fn) — more bytes
    than the int8 waveform (frame_len/span ~1.3x) but zero device
    resample/frame work; for compute-bound deployments.
    """
    if transfer not in ("int16", "int8"):
        raise ValueError(f"transfer must be 'int16' or 'int8', got {transfer!r}")
    og_rate, total_frames, _ = read_wav_info(audio_filepath)
    sample_size = int(sample_duration * og_rate)
    model_sample_size = int(sample_duration * input_sample_rate)
    chunk_frames = batch_size * sample_size
    first_frame, end_frame = 0, total_frames
    if chunk_range is not None:
        c0, c1 = chunk_range
        first_frame = min(c0 * chunk_frames, total_frames)
        end_frame = min(c1 * chunk_frames, total_frames)

    resampler = None
    if og_rate != input_sample_rate:
        cache = _resampler_cache if _resampler_cache is not None else {}
        key = (og_rate, input_sample_rate)
        if key not in cache:
            cache[key] = Resampler(og_rate, input_sample_rate)
        resampler = cache[key]
    if transfer == "int8" and resampler is not None:
        raise ValueError(
            "transfer='int8' requires native-rate files (no on-device "
            f"resampling; file rate {og_rate} vs model rate "
            f"{input_sample_rate})"
        )

    import jax

    def read_chunk_mono(start_frame: int):
        """Returns (samples_1d, dtype) — int16 zero-copy for mono PCM16 files
        (the common case: 4x less host->device traffic, dequantized in-graph),
        float32 decode otherwise."""
        nf = min(chunk_frames, end_frame - start_frame)  # stay inside the range
        raw = read_wav_pcm16_mono(audio_filepath, frame_offset=start_frame, num_frames=nf)
        if raw is not None:
            return raw, np.int16
        audio, _ = read_wav(audio_filepath, frame_offset=start_frame, num_frames=nf)
        if audio.shape[0] != 1:
            audio = audio.mean(axis=0, keepdims=True)
        return audio[0], np.float32

    def chunk_inputs():
        """Host decode + window + device transfer, one chunk at a time."""
        start_frame = first_frame
        while start_frame < end_frame:
            samples, dtype = read_chunk_mono(start_frame)
            if samples.shape[-1] == 0:
                return
            n = samples.shape[-1]
            nclips = math.ceil(n / sample_size)
            pad = nclips * sample_size - n
            if pad:
                samples = np.pad(samples, (0, pad))
            clips = samples.reshape(nclips, 1, sample_size)
            if nclips < batch_size:  # keep one static shape for XLA
                clips = np.concatenate(
                    [clips, np.zeros((batch_size - nclips, 1, sample_size), dtype)],
                    axis=0,
                )
            if frame_fn is not None and resampler is None:
                # framed path: a quantizing framer (frame_host_int8) yields a
                # (q, scale) tuple — device_put ships the pytree as-is and the
                # model's framed-int8 entry consumes it. Framed-int8 ships
                # frame_len/span (~1.3x) MORE bytes than the int8 waveform —
                # it wins only when the deployment is compute- rather than
                # transfer-bound (docs/PERFORMANCE.md round 5).
                framed = frame_fn(clips[:, 0, :])
                if transfer == "int8" and not isinstance(framed, tuple):
                    raise ValueError(
                        "transfer='int8' with frame_fn requires a quantizing "
                        "framer (SpectralFrontend.frame_host_int8 — set "
                        "tpu_config.frontend_precision: int8)"
                    )
                yield nclips, jax.device_put(framed)
                start_frame += chunk_frames
                continue
            if transfer == "int8":
                q, scale = quantize_clips_int8(clips)
                yield nclips, (jax.device_put(q), jax.device_put(scale))
                start_frame += chunk_frames
                continue
            # explicit async transfer — handing numpy to the jitted function
            # uses a synchronous per-argument path, far slower on remote chips
            x = jax.device_put(np.ascontiguousarray(clips))
            if resampler is not None:
                if clips.dtype == np.int16:  # dequantize on device pre-resample
                    x = x.astype(np.float32) * (1.0 / 32768.0)
                x = resampler(x)
                if x.shape[-1] != model_sample_size:  # defensive clamp/pad
                    import jax.numpy as jnp

                    if x.shape[-1] > model_sample_size:
                        x = x[..., :model_sample_size]
                    else:
                        x = jnp.pad(x, ((0, 0), (0, 0), (0, model_sample_size - x.shape[-1])))
            yield nclips, x
            start_frame += chunk_frames

    def fetch(out) -> dict:
        """Single device->host fetch; accepts packed (B,K,6) or dict outputs."""
        if isinstance(out, dict):
            return {k: np.asarray(v) for k, v in out.items()}
        from .decode import unpack_detections

        return unpack_detections(np.asarray(out))

    all_rows: List[dict] = []
    clip_offset = 0 if chunk_range is None else chunk_range[0] * batch_size
    pending = None  # (nclips, in-flight device result)

    def drain(nclips: int, out) -> None:
        nonlocal clip_offset
        dets = fetch(out)
        per_clip = postprocess_detections(dets, sample_duration, return_start_end=True)
        for ci in range(nclips):  # padded clips are dropped here
            base = (clip_offset + ci) * sample_duration
            for conf, obj, cls, start, end in per_clip[ci]:
                all_rows.append(
                    {
                        "confidence": conf,
                        "objectness": obj,
                        "class_idx": cls,
                        "start": base + start,
                        "end": base + end,
                    }
                )
        clip_offset += nclips

    # two-deep pipeline: dispatch chunk N+1 before fetching chunk N so the
    # device->host round trip overlaps the next chunk's decode + compute;
    # chunk production (decode + quantize + async put) additionally runs on
    # a prefetch thread so host work hides under the in-flight transfer
    for nclips, x in _prefetch_iter(chunk_inputs()):
        out = infer_fn(x)
        if pending is not None:
            drain(*pending)
        pending = (nclips, out)
    if pending is not None:
        drain(*pending)

    if return_rows:
        all_rows.sort(key=lambda r: (r["start"], r["end"]))
        return all_rows
    write_rows_csv(all_rows, idx2class_map, audio_filepath, output_dir)
    return None


def _iter_windows(path: str, sample_size: int, total_frames: int):
    """Yield (clip_idx, window) fixed-size mono windows of one file; int16
    zero-copy for PCM16 mono, float32 otherwise; tail zero-padded."""
    start, clip = 0, 0
    while start < total_frames:
        n = min(sample_size, total_frames - start)
        raw = read_wav_pcm16_mono(path, frame_offset=start, num_frames=n)
        if raw is None:
            audio, _ = read_wav(path, frame_offset=start, num_frames=n)
            if audio.shape[0] != 1:
                audio = audio.mean(axis=0, keepdims=True)
            raw = audio[0].astype(np.float32)
        if raw.shape[-1] < sample_size:
            raw = np.pad(raw, (0, sample_size - raw.shape[-1]))
        yield clip, raw
        clip += 1
        start += sample_size


def evaluate_files_batched(
    infer_fn: Callable,
    paths: List[str],
    output_dir: str,
    input_sample_rate: int,
    sample_duration: float,
    batch_size: int,
    idx2class_map: Dict[int, str],
    frame_fn: Optional[Callable] = None,
    verbose: bool = False,
    transfer: str = "int16",
) -> int:
    """Cross-file window scheduler: fills every device batch with windows from
    as many files as needed, so directories of short files run at full-batch
    throughput instead of paying a partial batch per file (the reference's
    asyncio fan-out, ``inference.py:212-236``, only overlaps host IO — its
    device batches still end ragged at every file boundary).

    All ``paths`` must already be at ``input_sample_rate`` (the runner routes
    other-rate files to the per-file path, which resamples on device).
    Per-file row assembly, sorting, RLE merge, and CSV naming are identical to
    :func:`evaluate_audio`. ``transfer``: see :func:`evaluate_audio`.
    """
    import jax

    if transfer not in ("int16", "int8"):
        raise ValueError(f"transfer must be 'int16' or 'int8', got {transfer!r}")

    sample_size = int(sample_duration * input_sample_rate)
    infos = [read_wav_info(p) for p in paths]
    per_file_rows: List[List[dict]] = [[] for _ in paths]
    # windows still in flight per file: when a file's count drains to zero its
    # CSV is written (and progress printed) immediately, not at the very end
    remaining = [-(-total // sample_size) for (_, total, _) in infos]
    os.makedirs(output_dir, exist_ok=True)
    done_count = [0]

    def finish_file(fi: int):
        write_rows_csv(per_file_rows[fi], idx2class_map, paths[fi], output_dir)
        per_file_rows[fi] = []
        done_count[0] += 1
        if verbose:
            print(f"[{done_count[0]}/{len(paths)}] {os.path.basename(paths[fi])}")

    for fi, r in enumerate(remaining):
        if r == 0:  # zero-length file: no windows, write its (empty) CSV now
            finish_file(fi)

    def windows():
        for fi, (path, (_, total, _)) in enumerate(zip(paths, infos)):
            yield from ((fi, clip, w) for clip, w in _iter_windows(path, sample_size, total))

    def to_device(metas, wins):
        if all(w.dtype == np.int16 for w in wins):
            arr = np.stack(wins)
        else:  # mixed sources: promote, scaling PCM16 exactly like the readers
            arr = np.stack([
                w.astype(np.float32) * (1.0 / 32768.0) if w.dtype == np.int16
                else w.astype(np.float32)
                for w in wins
            ])
        n = arr.shape[0]
        if n < batch_size:
            arr = np.concatenate(
                [arr, np.zeros((batch_size - n,) + arr.shape[1:], arr.dtype)], axis=0
            )
        if frame_fn is not None:
            framed = frame_fn(arr)
            if transfer == "int8" and not isinstance(framed, tuple):
                raise ValueError(
                    "transfer='int8' with frame_fn requires a quantizing "
                    "framer (SpectralFrontend.frame_host_int8 — set "
                    "tpu_config.frontend_precision: int8)"
                )
            return jax.device_put(framed)
        if transfer == "int8":
            q, scale = quantize_clips_int8(arr[:, None, :])
            return (jax.device_put(q), jax.device_put(scale))
        return jax.device_put(arr[:, None, :])

    def fetch(out) -> dict:
        if isinstance(out, dict):
            return {k: np.asarray(v) for k, v in out.items()}
        from .decode import unpack_detections

        return unpack_detections(np.asarray(out))

    def drain(metas, out):
        dets = fetch(out)
        per_clip = postprocess_detections(dets, sample_duration, return_start_end=True)
        for i, (fi, clip) in enumerate(metas):
            base = clip * sample_duration
            for conf, obj, cls, start, end in per_clip[i]:
                per_file_rows[fi].append({
                    "confidence": conf, "objectness": obj, "class_idx": cls,
                    "start": base + start, "end": base + end,
                })
            remaining[fi] -= 1
            if remaining[fi] == 0:
                finish_file(fi)

    def batches():
        metas, wins = [], []
        for item in windows():
            metas.append(item[:2])
            wins.append(item[2])
            if len(wins) == batch_size:
                yield metas, to_device(metas, wins)
                metas, wins = [], []
        if wins:
            yield metas, to_device(metas, wins)

    # same two-deep pipeline + producer thread as evaluate_audio: window
    # decode/stack/quantize runs ahead under the in-flight transfer
    pending = None
    for metas, x in _prefetch_iter(batches()):
        out = infer_fn(x)
        if pending is not None:
            drain(*pending)
        pending = (metas, out)
    if pending is not None:
        drain(*pending)
    assert done_count[0] == len(paths), "window accounting out of sync"
    return len(paths)


def write_rows_csv(
    all_rows: List[dict],
    idx2class_map: Dict[int, str],
    audio_filepath: str,
    output_dir: str,
) -> str:
    """Sort detection rows by time, RLE-merge, write ``<name>_results.csv``.

    Time-orders by start before the RLE merge. The reference keeps per-clip
    *center* order (inference.py:93-99), under which a wide interval whose
    center is late can precede an earlier-starting one — RLE-merging that
    order can split events; intended behavior is time-ordered rows.
    """
    all_rows = sorted(all_rows, key=lambda r: (r["start"], r["end"]))
    rows = [
        {
            "start": timedelta(seconds=round(r["start"], 2)),
            "end": timedelta(seconds=round(r["end"], 2)),
            "class": idx2class_map[r["class_idx"]],
        }
        for r in all_rows
    ]
    merged = rle_merge(rows)

    parts = os.path.normpath(audio_filepath).split(os.sep)
    filename = ".".join(parts[-1].split(".")[:-1]) or parts[-1]
    if len(parts) >= 2 and parts[-2] not in ("", ".", os.sep):
        output_dir = os.path.join(output_dir, parts[-2])
    os.makedirs(output_dir, exist_ok=True)

    import pandas as pd

    out_path = os.path.join(output_dir, f"{filename}_results.csv")
    pd.DataFrame(merged, columns=["start", "end", "class"]).to_csv(out_path, index=False)
    return out_path
