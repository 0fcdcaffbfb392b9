"""Smoke test for the dataset prep CLI (reference ``get_dataset.py:80-169``):
80/20 split into train/eval, annotation JSONs gathered, extraneous dirs
pruned, and WAVs resampled in place to the target rate."""

import json
import os

import numpy as np
import pytest

from audioyolo_tpu.data.wavio import read_wav, write_wav

import get_dataset


def _make_raw_dataset(root, n=10, sr=16000):
    src = os.path.join(root, "openbmat", "raw", "audio")
    ann = os.path.join(root, "openbmat", "raw", "anns")
    os.makedirs(src)
    os.makedirs(ann)
    rng = np.random.default_rng(0)
    for i in range(n):
        write_wav(os.path.join(src, f"clip{i}.wav"),
                  (rng.standard_normal(sr) * 0.1).astype(np.float32), sr)
    for name in ("annotations_a.json", "annotations_b.json"):
        with open(os.path.join(ann, name), "w") as f:
            json.dump({"dummy": True}, f)
    return src, ann


def test_split_move_and_resample(tmp_path):
    root = str(tmp_path)
    _make_raw_dataset(root, n=10, sr=16000)

    get_dataset.main([
        "--root", root, "--name", "openbmat",
        "--target_sample_rate", "8000", "--num_concurrency", "2", "--seed", "0",
    ])

    ddir = os.path.join(root, "openbmat")
    assert sorted(os.listdir(ddir)) == ["annotations", "eval", "train"]
    train = os.listdir(os.path.join(ddir, "train"))
    evals = os.listdir(os.path.join(ddir, "eval"))
    assert len(train) == 8 and len(evals) == 2  # ceil(0.8 * 10)
    assert len(os.listdir(os.path.join(ddir, "annotations"))) == 2

    # every WAV resampled in place to the target rate, duration preserved
    for sub, names in (("train", train), ("eval", evals)):
        for name in names:
            audio, sr = read_wav(os.path.join(ddir, sub, name))
            assert sr == 8000
            assert audio.shape[-1] == pytest.approx(8000, abs=2)


def test_format_only_skips_split(tmp_path):
    root = str(tmp_path)
    ddir = os.path.join(root, "openbmat")
    os.makedirs(os.path.join(ddir, "train"))
    write_wav(os.path.join(ddir, "train", "a.wav"),
              np.zeros(4000, np.float32), 4000)

    get_dataset.main([
        "--root", root, "--name", "openbmat", "--format_only",
        "--target_sample_rate", "8000",
    ])
    audio, sr = read_wav(os.path.join(ddir, "train", "a.wav"))
    assert sr == 8000
    assert os.listdir(ddir) == ["train"]  # no split/prune in format_only mode


def test_missing_kaggle_gives_actionable_error(tmp_path):
    with pytest.raises(SystemExit, match="kaggle"):
        get_dataset.main([
            "--root", str(tmp_path), "--name", "nope",
            "--url", "https://www.kaggle.com/datasets/user/thing",
        ])


def test_make_synth_dataset_tool(tmp_path):
    """tools/make_synth_dataset.py writes the reference dataset layout that
    train.py consumes (train/ + eval/ wavs, annotations/annotation.json)."""
    import json
    import subprocess
    import sys

    out = tmp_path / "ds"
    r = subprocess.run(
        [sys.executable, "tools/make_synth_dataset.py", "--out", str(out),
         "--train", "3", "--eval", "2", "--seed", "1"],
        capture_output=True, text=True, timeout=300,
    )
    assert r.returncode == 0, r.stderr
    ann = json.load(open(out / "annotations" / "annotation.json"))
    clips = ann["annotations"]["annotator_a"]
    assert len(clips) == 5
    from audioyolo_tpu.data.dataset import AudioDataset
    from audioyolo_tpu.data.wavio import read_wav_info

    for split, n in (("train", 3), ("eval", 2)):
        ds = AudioDataset(str(out / split), clips, sample_duration=60,
                          sample_rate=22050, max_targets=48)
        assert len(ds) == n
        assert set(ds.class2idx) <= {"music", "alarm"}
        rate, frames, ch = read_wav_info(str(next((out / split).glob("*.wav"))))
        assert (rate, ch) == (22050, 1) and frames == 60 * 22050
