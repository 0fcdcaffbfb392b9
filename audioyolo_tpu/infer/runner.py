"""Directory fan-out for batch inference (reference ``inference.py:212-236``).

Two strategies, composed automatically by :func:`evaluate_dir`:

- **Cross-file window batching** (default for files already at the model's
  input rate): `evaluate_files_batched` fills every device batch with windows
  drawn from as many files as needed, so a directory of short files runs at
  full-batch throughput. The reference's asyncio fan-out only overlaps host
  IO — its device batches still end ragged at every file boundary.
- **Threaded per-file streaming** (files at other sample rates, which need
  the on-device rate conversion): a bounded thread pool overlaps the host-side
  WAV decode of the next files with device execution, the same IO-level
  concurrency the reference gets from its asyncio executor fan-out.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Callable, Dict

from ..data.wavio import read_wav_info
from .streaming import evaluate_audio, evaluate_files_batched


def evaluate_dir(
    infer_fn: Callable,
    audio_dir: str,
    output_dir: str,
    extension: str = "wav",
    num_concurrency: int = 10,
    verbose: bool = True,
    batch_windows: bool = True,
    **kwargs,
) -> int:
    paths = sorted(glob.glob(os.path.join(audio_dir, f"*.{extension}")))
    os.makedirs(output_dir, exist_ok=True)
    resampler_cache: Dict = {}

    done = 0
    if batch_windows and "input_sample_rate" in kwargs:
        # Probe headers defensively: one corrupt file must not abort the
        # whole directory before anything is written. Unreadable files fall
        # through to the threaded per-file path, which surfaces the error
        # after the readable files complete.
        native_rate = []
        for p in paths:
            try:
                rate = read_wav_info(p)[0]
            except Exception:
                continue
            if rate == kwargs["input_sample_rate"]:
                native_rate.append(p)
        if len(native_rate) > 1:
            done += evaluate_files_batched(
                infer_fn,
                native_rate,
                output_dir,
                input_sample_rate=kwargs["input_sample_rate"],
                sample_duration=kwargs["sample_duration"],
                batch_size=kwargs["batch_size"],
                idx2class_map=kwargs["idx2class_map"],
                frame_fn=kwargs.get("frame_fn"),
                verbose=verbose,
                transfer=kwargs.get("transfer", "int16"),
            )
            batched = set(native_rate)
            paths = [p for p in paths if p not in batched]

    if not paths:
        return done
    threaded_done = 0
    with ThreadPoolExecutor(max_workers=max(1, num_concurrency)) as pool:
        futures = {
            pool.submit(
                evaluate_audio,
                infer_fn,
                path,
                output_dir,
                _resampler_cache=resampler_cache,
                **kwargs,
            ): path
            for path in paths
        }
        for fut in as_completed(futures):
            fut.result()  # propagate worker exceptions
            threaded_done += 1
            if verbose:
                print(f"[{threaded_done}/{len(paths)}] {os.path.basename(futures[fut])}")
    return done + threaded_done
