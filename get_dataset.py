"""Dataset acquisition & preparation (CLI surface of reference ``get_dataset.py``).

Optionally downloads a Kaggle dataset (the ``kaggle`` package is not part of
this image — the import is gated), splits audio files 80/20 into
``train/``/``eval``, moves annotation JSONs, and resamples WAV files to the
target rate in place using the native resampler. Non-WAV inputs (mp3, ...)
need an external decoder; without ffmpeg on PATH they are reported and
skipped.
"""

from __future__ import annotations

import argparse
import glob
import logging
import math
import os
import random
import shutil
import subprocess
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from audioyolo_tpu.data.wavio import read_wav, write_wav

logger = logging.getLogger(__name__)


def _have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def convert_audio(path: str, dest_ext: str = "wav", target_sample_rate: int = 22050):
    ext = path.rsplit(".", 1)[-1].lower()
    if ext != "wav":
        if not _have_ffmpeg():
            logger.warning("skipping %s: no ffmpeg available to decode .%s", path, ext)
            return
        out = path[: -(len(ext) + 1)] + f".{dest_ext}"
        subprocess.run(
            ["ffmpeg", "-y", "-i", path, "-ar", str(target_sample_rate), out],
            check=True, capture_output=True,
        )
        os.remove(path)
        return

    audio, sr = read_wav(path)
    if sr == target_sample_rate:
        return
    import jax.numpy as jnp

    from audioyolo_tpu.ops.resample import Resampler

    audio = np.asarray(Resampler(sr, target_sample_rate)(jnp.asarray(audio)))
    write_wav(path, audio, target_sample_rate)


def glob_all_exts(root: str, exts, recursive: bool = True):
    files = []
    for ext in exts:
        files += glob.glob(os.path.join(root, "**", f"*.{ext}"), recursive=recursive)
    return files


def main(argv=None):
    parser = argparse.ArgumentParser(description="Dataset downloader / formatter")
    parser.add_argument("--url", type=str, default="", metavar="", help="Kaggle dataset URL")
    parser.add_argument("--name", type=str, default="openbmat", metavar="")
    parser.add_argument("--to_ext", type=str, default="wav", metavar="")
    parser.add_argument("--target_sample_rate", type=int, default=22050, metavar="")
    parser.add_argument("--num_concurrency", type=int, default=4, metavar="")
    parser.add_argument("--format_only", action="store_true")
    parser.add_argument("--seed", type=int, default=42, metavar="")
    parser.add_argument("--root", type=str, default="dataset", metavar="",
                        help="parent directory for the dataset folder")
    args = parser.parse_args(argv)

    dataset_dir = os.path.join(args.root, args.name)
    supported = ["mp3", "wav"]

    if not args.format_only:
        if args.url:
            try:
                import kaggle  # noqa: F401
            except ImportError as e:
                raise SystemExit(
                    "the kaggle package is not installed in this environment; "
                    "download the dataset manually into "
                    f"{dataset_dir} and re-run with --format_only"
                ) from e
            os.makedirs(dataset_dir, exist_ok=True)
            kaggle.api.dataset_download_cli(
                args.url.split("datasets/")[-1], path=dataset_dir, unzip=True
            )
        if not os.path.exists(dataset_dir):
            raise OSError(f"path: {dataset_dir} does not exist")

        audio_files = glob_all_exts(dataset_dir, supported)
        annotation_files = glob.glob(
            os.path.join(dataset_dir, "**", "*.json"), recursive=True
        )
        random.seed(args.seed)
        n_train = math.ceil(0.8 * len(audio_files))
        train_files = set(random.sample(audio_files, n_train))

        for sub in ("train", "eval", "annotations"):
            os.makedirs(os.path.join(dataset_dir, sub), exist_ok=True)
        for f in audio_files:
            dest = "train" if f in train_files else "eval"
            if os.path.dirname(f) != os.path.join(dataset_dir, dest):
                shutil.move(f, os.path.join(dataset_dir, dest))
        for f in annotation_files:
            if os.path.dirname(f) != os.path.join(dataset_dir, "annotations"):
                shutil.move(f, os.path.join(dataset_dir, "annotations"))
        for d in os.listdir(dataset_dir):
            if d not in ("train", "eval", "annotations"):
                p = os.path.join(dataset_dir, d)
                shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)

    files = glob_all_exts(dataset_dir, supported)
    with ThreadPoolExecutor(max_workers=args.num_concurrency) as pool:
        list(pool.map(
            lambda f: convert_audio(f, args.to_ext, args.target_sample_rate), files
        ))
    print(f"prepared {len(files)} files under {dataset_dir}")


if __name__ == "__main__":
    logging.basicConfig(level=logging.INFO)
    main()
