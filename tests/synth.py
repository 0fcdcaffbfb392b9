"""Synthetic audio + annotation fixtures for end-to-end tests."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Sequence, Tuple

import numpy as np

from audioyolo_tpu.data.wavio import write_wav

CLASS_FREQS = {"tone": 440.0, "beep": 1200.0}


def synth_clip(
    sr: int, duration: float, segments: Sequence[Tuple[float, float, str]], seed: int = 0
) -> np.ndarray:
    """Silence with class-specific tones inside the annotated spans."""
    n = int(duration * sr)
    rng = np.random.default_rng(seed)
    x = 0.005 * rng.standard_normal(n).astype(np.float32)
    t = np.arange(n) / sr
    for start, end, cls in segments:
        f = CLASS_FREQS[cls]
        mask = (t >= start) & (t < end)
        x[mask] += 0.5 * np.sin(2 * np.pi * f * t[mask]).astype(np.float32)
    return x


def make_flat_dataset(
    root: str,
    sr: int = 8000,
    duration: float = 4.0,
    n_files: int = 6,
    seed: int = 0,
) -> Dict[str, dict]:
    """Write wavs + a flat-layout annotation dict; returns the annotations."""
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(seed)
    annotations: Dict[str, dict] = {}
    for i in range(n_files):
        name = f"clip{i:03d}"
        n_seg = int(rng.integers(1, 3))
        segs, cursor = [], 0.2
        for s in range(n_seg):
            width = float(rng.uniform(0.5, 1.4))
            start = cursor
            end = min(start + width, duration - 0.1)
            if end <= start:
                break
            cls = ["tone", "beep"][int(rng.integers(0, 2))]
            segs.append((start, end, cls))
            cursor = end + float(rng.uniform(0.2, 0.6))
        x = synth_clip(sr, duration, segs, seed=seed + i)
        write_wav(os.path.join(root, f"{name}.wav"), x, sr)
        annotations[name] = {
            f"seg-{j}": {"start": s, "end": e, "class": c} for j, (s, e, c) in enumerate(segs)
        }
    return annotations


def make_grouped_dataset(root: str, sr: int = 8000, duration: float = 4.0, seed: int = 3):
    """One long file whose annotations are split into ``group-N`` windows."""
    os.makedirs(root, exist_ok=True)
    name = "longclip"
    rng = np.random.default_rng(seed)
    n_groups = 3
    all_segs: List[Tuple[float, float, str]] = []
    annotations = {name: {}}
    for g in range(n_groups):
        base = g * duration
        start = base + float(rng.uniform(0.2, 1.0))
        end = min(start + float(rng.uniform(0.5, 1.5)), base + duration - 0.1)
        cls = ["tone", "beep"][g % 2]
        all_segs.append((start, end, cls))
        annotations[name][f"group-{g}"] = {
            "seg-0": {"start": start, "end": end, "class": cls}
        }
    x = synth_clip(sr, duration * n_groups, all_segs, seed=seed)
    write_wav(os.path.join(root, f"{name}.wav"), x, sr)
    return annotations


def save_reference_layout(root: str, annotations: dict, annotator: str = "annotator_a"):
    """Write the annotation JSON in the reference's on-disk layout
    (``train.py:36-41``: dataset/annotations/annotation.json)."""
    ann_dir = os.path.join(root, "annotations")
    os.makedirs(ann_dir, exist_ok=True)
    with open(os.path.join(ann_dir, "annotation.json"), "w") as f:
        json.dump({"annotations": {annotator: annotations}}, f)
