"""Directory fan-out for batch inference (reference ``inference.py:212-236``).

Files are processed with a bounded thread pool: the TPU serializes compute
through the single jitted function, while worker threads overlap the host-side
WAV decode/resample of the next files with device execution — the same
IO-level concurrency the reference gets from its asyncio executor fan-out.
"""

from __future__ import annotations

import glob
import os
from concurrent.futures import ThreadPoolExecutor, as_completed
from typing import Callable, Dict

from .streaming import evaluate_audio


def evaluate_dir(
    infer_fn: Callable,
    audio_dir: str,
    output_dir: str,
    extension: str = "wav",
    num_concurrency: int = 10,
    verbose: bool = True,
    **kwargs,
) -> int:
    paths = sorted(glob.glob(os.path.join(audio_dir, f"*.{extension}")))
    os.makedirs(output_dir, exist_ok=True)
    resampler_cache: Dict = {}

    done = 0
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
            done += 1
            if verbose:
                print(f"[{done}/{len(paths)}] {os.path.basename(futures[fut])}")
    return done
