"""WAV IO, dataset indexing/padding, concat, and loader behavior."""

import numpy as np
import pytest

from audioyolo_tpu.data.dataset import AudioConcatDataset, AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.data.wavio import read_wav, read_wav_info, write_wav

from synth import make_flat_dataset, make_grouped_dataset


def test_wav_roundtrip(tmp_path, rng):
    x = (0.3 * rng.standard_normal(4000)).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 8000)
    y, sr = read_wav(path)
    assert sr == 8000 and y.shape == (1, 4000)
    np.testing.assert_allclose(y[0], np.clip(x, -1.0, 32767 / 32768), atol=1.0 / 32000)


def test_wav_partial_read(tmp_path, rng):
    x = rng.standard_normal(5000).astype(np.float32) * 0.5
    path = str(tmp_path / "b.wav")
    write_wav(path, x, 8000)
    y, _ = read_wav(path, frame_offset=1000, num_frames=2000)
    assert y.shape == (1, 2000)
    full, _ = read_wav(path)
    np.testing.assert_array_equal(y[0], full[0, 1000:3000])
    info = read_wav_info(path)
    assert info == (8000, 5000, 1)


def test_wav_stereo_and_clamped_reads(tmp_path, rng):
    x = rng.standard_normal((2, 1000)).astype(np.float32) * 0.2
    path = str(tmp_path / "c.wav")
    write_wav(path, x, 22050)
    y, sr = read_wav(path)
    assert y.shape == (2, 1000) and sr == 22050
    # read past EOF is clamped, not an error
    y2, _ = read_wav(path, frame_offset=900, num_frames=500)
    assert y2.shape == (2, 100)


def test_dataset_flat_layout(tmp_path):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=4)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    assert len(ds) == 4
    assert set(ds.class2idx) <= {"tone", "beep"}
    item = ds[0]
    assert item["audio"].shape == (1, 32000)
    assert item["classes"].shape == (8,)
    n_valid = item["valid"].sum()
    assert n_valid >= 1
    # every valid, non-pad target lies inside the clip
    v = item["valid"]
    real = v & (item["classes"] != -100)
    assert (item["centers"][real] >= 0).all() and (item["centers"][real] <= 4).all()


def test_dataset_pad_label(tmp_path):
    # a file whose annotated span is shorter than the window gets zero-padding
    # plus an ignore-index target covering the padded span
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=3)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    found_pad = False
    for i in range(len(ds)):
        item = ds[i]
        pads = (item["classes"] == -100) & item["valid"]
        if pads.any():
            found_pad = True
            j = int(np.argmax(pads))
            # Reference convention: label times stay in *absolute* file time
            # (dataset.py:141-160 never rebases by audio_start for the flat
            # layout), so the pad interval ends at audio_start + duration.
            real = item["valid"] & (item["classes"] != -100)
            starts = item["centers"][real] - item["widths"][real] / 2
            audio_start = starts.min()
            end = item["centers"][j] + item["widths"][j] / 2
            assert end == pytest.approx(audio_start + 4.0, abs=1e-3)
    assert found_pad


def test_dataset_grouped_layout(tmp_path):
    root = str(tmp_path / "train")
    ann = make_grouped_dataset(root)
    assert AudioDataset.is_grouped_annotations(ann)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    assert len(ds) == 3  # one sample per group
    for i in range(3):
        item = ds[i]
        assert item["audio"].shape == (1, 32000)
        real = item["valid"] & (item["classes"] != -100)
        # group-local times rebased into [0, 4]
        assert (item["centers"][real] >= 0).all() and (item["centers"][real] <= 4.0).all()


def test_concat_dataset_merges_vocab(tmp_path):
    r1, r2 = str(tmp_path / "a"), str(tmp_path / "b")
    a1 = make_flat_dataset(r1, n_files=2, seed=1)
    a2 = make_flat_dataset(r2, n_files=3, seed=9)
    d1 = AudioDataset(r1, a1, sample_duration=4, sample_rate=8000, max_targets=8)
    d2 = AudioDataset(r2, a2, sample_duration=4, sample_rate=8000, max_targets=8)
    combo = d1 + d2
    assert isinstance(combo, AudioConcatDataset)
    assert len(combo) == 5
    assert d1.class2idx is combo.class2idx or d1.class2idx == combo.class2idx
    w = combo.get_class_weights()
    assert w.shape == (len(combo.class2idx),)
    _ = combo[4]  # spans into the second dataset


def test_loader_policies(tmp_path):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=5)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

    partial = list(BatchLoader(ds, 2, shuffle=False, last_batch="partial"))
    assert [b["audio"].shape[0] for b in partial] == [2, 2, 1]

    dropped = list(BatchLoader(ds, 2, shuffle=False, last_batch="drop"))
    assert [b["audio"].shape[0] for b in dropped] == [2, 2]

    padded = list(BatchLoader(ds, 2, shuffle=False, last_batch="pad"))
    assert [b["audio"].shape[0] for b in padded] == [2, 2, 2]
    assert padded[-1]["clip_valid"].tolist() == [True, False]
    assert not padded[-1]["valid"][1].any()

    # shuffling is deterministic per (seed, epoch) and differs across epochs
    ld = BatchLoader(ds, 2, shuffle=True, seed=7)
    e1 = [b["audio"].sum() for b in ld]
    e2 = [b["audio"].sum() for b in ld]
    assert len(e1) == len(e2)


def test_loader_sharding_partitions_epoch(tmp_path):
    """shard=(i, n) loaders must cover the globally-shuffled epoch exactly
    once (up to wrap-padding), with equal lengths on every shard."""
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=7, seed=2)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    assert len(ds) == 7

    def epoch_ids(loader):
        ids = []
        for b in loader:
            # recover dataset identity via the audio content hash
            for a in b["audio"]:
                ids.append(a.tobytes())
        return ids

    full = BatchLoader(ds, 2, shuffle=True, seed=5)
    shards = [BatchLoader(ds, 2, shuffle=True, seed=5, shard=(i, 3)) for i in range(3)]
    assert all(len(s) == 2 for s in shards)  # ceil(7/3)=3 items -> 2 batches

    ref = epoch_ids(full)
    got = [epoch_ids(s) for s in shards]
    assert all(len(g) == 3 for g in got)
    # union covers the dataset; total = 9 = 7 + 2 wrap-padded duplicates
    assert set(ref) == set(x for g in got for x in g)
    # shards draw from the same global order: concatenating them re-sorted by
    # stride position reproduces the wrapped order
    wrapped = ref + ref[:2]
    expect = [[wrapped[j] for j in range(i, 9, 3)] for i in range(3)]
    assert got == expect

    # epochs advance the shuffle identically across shards
    ref2 = epoch_ids(full)
    assert ref2 != ref
    got2 = [epoch_ids(BatchLoader(ds, 2, shuffle=True, seed=5, shard=(i, 3))) for i in range(3)]
    assert set(x for g in got2 for x in g) == set(ref)  # same dataset

    with pytest.raises(ValueError):
        BatchLoader(ds, 2, shard=(3, 3))


def test_device_cached_loader_matches_batchloader(tmp_path):
    """DeviceCachedLoader must reproduce BatchLoader's batches exactly —
    same shuffle order, same audio rows, same targets, same padding — for
    every last_batch policy and transfer dtype."""
    import numpy as np

    from audioyolo_tpu.data.loader import DeviceCachedLoader

    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=5)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

    for policy in ("partial", "pad", "drop"):
        for dt in ("float32", "int16"):
            ref = BatchLoader(ds, 2, shuffle=True, seed=7, last_batch=policy,
                              transfer_dtype=dt)
            cached = DeviceCachedLoader.wrap(
                BatchLoader(ds, 2, shuffle=True, seed=7, last_batch=policy,
                            transfer_dtype=dt))
            assert isinstance(cached, DeviceCachedLoader), (policy, dt)
            assert len(cached) == len(ref)
            for _ in range(2):  # two epochs: shuffle stays in lockstep
                for rb, cb in zip(list(ref), list(cached), strict=True):
                    assert set(rb) == set(cb), (policy, dt)
                    for k in rb:
                        np.testing.assert_array_equal(
                            rb[k], np.asarray(cb[k]), err_msg=f"{policy}/{dt}/{k}")

    # budget gate: a tiny max_mb must return the plain loader
    plain = DeviceCachedLoader.wrap(BatchLoader(ds, 2), max_mb=0.0001)
    assert isinstance(plain, BatchLoader)


def test_device_cached_loader_tuple_audio(tmp_path):
    """(q, scale) framed-int8 audio (frontend_precision 'int8') must cache
    and gather identically to the plain BatchLoader, including pad mode."""
    import copy

    import numpy as np

    from conftest import TINY_CFG
    from audioyolo_tpu.config import Config
    from audioyolo_tpu.data.loader import DeviceCachedLoader
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    raw = copy.deepcopy(TINY_CFG)
    raw.setdefault("tpu_config", {})["frontend_precision"] = "int8"
    fe = SpectralFrontend(Config(raw))
    assert fe.fused_int8

    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=5)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

    for policy in ("partial", "pad"):
        ref = BatchLoader(ds, 2, shuffle=True, seed=3, last_batch=policy,
                          frame_fn=fe.frame_host_int8)
        cached = DeviceCachedLoader.wrap(
            BatchLoader(ds, 2, shuffle=True, seed=3, last_batch=policy,
                        frame_fn=fe.frame_host_int8))
        assert isinstance(cached, DeviceCachedLoader)
        for rb, cb in zip(list(ref), list(cached), strict=True):
            assert isinstance(rb["audio"], tuple) and len(rb["audio"]) == 2
            for j in range(2):
                np.testing.assert_array_equal(
                    rb["audio"][j], np.asarray(cb["audio"][j]),
                    err_msg=f"{policy}/audio[{j}]")
            for k in rb:
                if k == "audio":
                    continue
                np.testing.assert_array_equal(rb[k], np.asarray(cb[k]),
                                              err_msg=f"{policy}/{k}")
