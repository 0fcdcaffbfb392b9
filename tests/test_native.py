"""Native C++ audio loader vs the numpy reference reader (bit parity)."""

import numpy as np
import pytest

from audioyolo_tpu.data import native
from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.data.wavio import read_wav, write_wav

from synth import make_flat_dataset

pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="native library not built"
)


def test_native_info_and_read_matches_numpy(tmp_path, rng):
    x = (0.4 * rng.standard_normal((2, 5000))).astype(np.float32)
    path = str(tmp_path / "a.wav")
    write_wav(path, x, 22050)

    assert native.wav_info(path) == (22050, 5000, 2)

    got = native.read_mono(path, 1000, 2000, out_len=3000)
    ref, _ = read_wav(path, frame_offset=1000, num_frames=2000)
    ref_mono = ref.mean(axis=0)
    np.testing.assert_allclose(got[:2000], ref_mono, atol=1e-7)
    assert (got[2000:] == 0).all()  # zero padding


def test_native_batch_matches_per_item(tmp_path, rng):
    paths, offs, cnts = [], [], []
    refs = []
    for i in range(5):
        x = (0.3 * rng.standard_normal(4000 + 100 * i)).astype(np.float32)
        p = str(tmp_path / f"f{i}.wav")
        write_wav(p, x, 8000)
        paths.append(p)
        offs.append(50 * i)
        cnts.append(3000)
        ref, _ = read_wav(p, frame_offset=50 * i, num_frames=3000)
        refs.append(ref[0])
    out = native.load_batch(paths, offs, cnts, out_len=3200, n_threads=3)
    assert out.shape == (5, 3200)
    for i in range(5):
        np.testing.assert_allclose(out[i, :3000], refs[i], atol=1e-7)
        assert (out[i, 3000:] == 0).all()


def test_loader_fast_path_equals_slow_path(tmp_path):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=4, seed=13)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

    fast = list(BatchLoader(ds, 2, shuffle=False, prefetch=0))
    # force the slow path by monkeypatching the probe
    ds2 = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    ds2.load_audio_batch = lambda *a, **k: None
    slow = list(BatchLoader(ds2, 2, shuffle=False, prefetch=0))

    assert len(fast) == len(slow)
    for fb, sb in zip(fast, slow):
        for key in sb:
            np.testing.assert_allclose(fb[key], sb[key], atol=1e-7, err_msg=key)


def test_native_missing_file_raises():
    with pytest.raises(IOError):
        native.read_mono("/nonexistent/file.wav", 0, 10, 10)
