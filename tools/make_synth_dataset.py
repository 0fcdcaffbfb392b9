"""Generate the synthetic OpenBMAT-like demo dataset (docs/RESULTS.md).

Writes ``<out>/train`` and ``<out>/eval`` directories of 60 s / 22.05 kHz
PCM16 wavs with 1-5 non-overlapping annotated events each (two spectrally
separable classes: "music" = low chord, "alarm" = high tone pair; widths
2.5-50 s matching the shipped anchor priors), plus the reference dataset
layout ``<out>/annotations/annotation.json`` =
``{"annotations": {<annotator>: {<clip>: {seg-N: ...}}}}`` consumed by
``train.py`` (set ``train_config.dataset_path: <out>``). Mirrors the data
shape produced by the reference's ``get_dataset.py`` prep.

Usage: python tools/make_synth_dataset.py --out /tmp/demo_ds \
           [--train 48] [--eval 16] [--seed 0] [--annotator annotator_a]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audioyolo_tpu.data.wavio import write_wav  # noqa: E402

SR = 22_050
DURATION = 60.0

CLASS_SYNTH = {
    "music": lambda t, rng: 0.25 * (
        np.sin(2 * np.pi * 220.0 * t) + 0.6 * np.sin(2 * np.pi * 277.2 * t)
        + 0.4 * np.sin(2 * np.pi * 329.6 * t)
    ),
    "alarm": lambda t, rng: 0.35 * (
        np.sin(2 * np.pi * 1760.0 * t) + 0.5 * np.sin(2 * np.pi * 2217.5 * t)
    ),
}


def synth_file(rng: np.random.Generator):
    n = int(DURATION * SR)
    x = (0.01 * rng.standard_normal(n)).astype(np.float32)
    t = np.arange(n) / SR
    events = []
    cursor = float(rng.uniform(0.5, 3.0))
    for _ in range(int(rng.integers(1, 6))):
        width = float(rng.uniform(2.5, 50.0))
        start = cursor
        end = min(start + width, DURATION - 0.3)
        if end - start < 2.5:
            break
        cls = ["music", "alarm"][int(rng.integers(0, 2))]
        mask = (t >= start) & (t < end)
        x[mask] += CLASS_SYNTH[cls](t[mask], rng).astype(np.float32)
        events.append((start, end, cls))
        cursor = end + float(rng.uniform(0.5, 2.0))
        if cursor > DURATION - 3.0:
            break
    return x, events


def make_split(out_dir: str, n_files: int, prefix: str, rng: np.random.Generator):
    os.makedirs(out_dir, exist_ok=True)
    annotations = {}
    for i in range(n_files):
        name = f"{prefix}{i:03d}"
        x, events = synth_file(rng)
        write_wav(os.path.join(out_dir, f"{name}.wav"), x, SR)
        annotations[name] = {
            f"seg-{j}": {"start": s, "end": e, "class": c}
            for j, (s, e, c) in enumerate(events)
        }
    return annotations


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--train", type=int, default=48)
    ap.add_argument("--eval", dest="n_eval", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--annotator", default="annotator_a")
    args = ap.parse_args()
    rng = np.random.default_rng(args.seed)
    # distinct name prefixes: both splits share one annotation dict (the
    # AudioDataset filters it by the wavs present in each directory)
    tr = make_split(os.path.join(args.out, "train"), args.train, "tr", rng)
    ev = make_split(os.path.join(args.out, "eval"), args.n_eval, "ev", rng)
    os.makedirs(os.path.join(args.out, "annotations"), exist_ok=True)
    with open(os.path.join(args.out, "annotations", "annotation.json"), "w") as f:
        json.dump({"annotations": {args.annotator: {**tr, **ev}}}, f)
    n_tr = sum(len(v) for v in tr.values())
    n_ev = sum(len(v) for v in ev.values())
    print(f"wrote {args.train} train ({n_tr} events) + {args.n_eval} eval ({n_ev} events) to {args.out}")


if __name__ == "__main__":
    main()
