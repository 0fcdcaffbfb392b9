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


def _python_framed(framer, audio_f32):
    """Reference path: quantize like the loader, then numpy phase framing
    (the leading axis keeps frame_host off its native int16 branch)."""
    a16 = np.clip(np.round(audio_f32 * 32768.0), -32768, 32767).astype(np.int16)
    return framer.frame_host(a16[None])[0]


@pytest.mark.skipif(
    not native.native_available() or not native.framed_available(),
    reason="framed native entry point not built",
)
class TestFramedDecode:
    def test_pcm16_mono_bit_exact(self, tmp_path, rng):
        """PCM16 mono spans (with offsets and zero-padded tails) decoded into
        the phase-grouped layout must equal quantize+frame_host exactly."""
        from audioyolo_tpu.ops.fused_frontend import FusedFrameDFT

        framer = FusedFrameDFT(22050, 16000, 1000, 1000, 1000, 64)  # 4 s clips
        clip_len = 4 * 22050
        paths, offs, cnts, refs = [], [], [], []
        for i in range(3):
            x = (0.3 * rng.standard_normal(clip_len + 500)).astype(np.float32)
            p = str(tmp_path / f"f{i}.wav")
            write_wav(p, x, 22050)
            off = 100 * i
            cnt = clip_len - 4000 * i  # shorter spans -> zero-padded tails
            paths.append(p), offs.append(off), cnts.append(cnt)
            ref, _ = read_wav(p, frame_offset=off, num_frames=cnt)
            padded = np.pad(ref[0], (0, clip_len - cnt))
            refs.append(_python_framed(framer, padded))
        out = native.load_batch_framed_i16(paths, offs, cnts, clip_len, framer)
        assert out.shape == (3, framer.n_ph, framer.n_groups, framer.frame_len)
        assert out.dtype == np.int16
        np.testing.assert_array_equal(out, np.stack(refs))

    def test_stereo_falls_back_to_float_decode(self, tmp_path, rng):
        """Non-mono sources take the C++ float decode + quantize path; allow
        1 LSB of reduction-order slack at the int16 rounding boundary."""
        from audioyolo_tpu.ops.fused_frontend import FusedFrameDFT

        framer = FusedFrameDFT(22050, 16000, 1000, 1000, 1000, 64)
        clip_len = 4 * 22050
        x = (0.3 * rng.standard_normal((2, clip_len))).astype(np.float32)
        p = str(tmp_path / "st.wav")
        write_wav(p, x, 22050)
        ref_f, _ = read_wav(p, num_frames=clip_len)
        ref = _python_framed(framer, ref_f.mean(axis=0))
        out = native.load_batch_framed_i16([p], [0], [clip_len], clip_len, framer)
        diff = np.abs(out[0].astype(np.int32) - ref.astype(np.int32))
        assert diff.max() <= 1

    def test_loader_i16_waveform_path_equals_python(self, tmp_path):
        """BatchLoader with transfer_dtype=int16 and no framer must take the
        native raw-int16 waveform path and match the quantize fallback."""
        root = str(tmp_path / "train")
        ann = make_flat_dataset(root, n_files=4, seed=7)
        ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
        nat = list(BatchLoader(ds, 2, shuffle=False, prefetch=0, transfer_dtype="int16"))
        ds2 = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
        ds2.load_audio_batch_i16 = lambda *a, **k: None  # force fallback
        py = list(BatchLoader(ds2, 2, shuffle=False, prefetch=0, transfer_dtype="int16"))
        assert len(nat) == len(py) == 2
        for nb, pb in zip(nat, py):
            assert nb["audio"].dtype == np.int16 and nb["audio"].shape == pb["audio"].shape
            for key in pb:
                np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)

    def test_loader_framed_path_equals_python(self, tmp_path, tiny_cfg):
        """BatchLoader(framer=...) must produce the same batches as the
        quantize+frame_fn fallback, including the repeat-padded final batch."""
        from audioyolo_tpu.ops.frontend import SpectralFrontend

        fe = SpectralFrontend(tiny_cfg)
        assert fe.fused is not None
        root = str(tmp_path / "train")
        ann = make_flat_dataset(root, n_files=5, seed=3)
        ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

        nat = list(BatchLoader(ds, 2, shuffle=False, prefetch=0, last_batch="pad",
                               transfer_dtype="int16", framer=fe.fused))
        ds2 = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
        ds2.load_audio_batch_framed = lambda *a, **k: None  # force fallback
        ds2.load_audio_batch = lambda *a, **k: None
        py = list(BatchLoader(ds2, 2, shuffle=False, prefetch=0, last_batch="pad",
                              transfer_dtype="int16", frame_fn=fe.frame_host))
        assert len(nat) == len(py) == 3
        for nb, pb in zip(nat, py):
            assert nb["audio"].dtype == np.int16 and nb["audio"].ndim == 4
            for key in pb:
                np.testing.assert_array_equal(nb[key], pb[key], err_msg=key)


def test_native_quant_i8_matches_numpy(rng):
    """ayt_quant_i8 (the streaming int8-transfer quantizer) must agree with
    the numpy definition in quantize_clips_int8: identical steps, codes within
    1 lsb (reciprocal-multiply vs divide rounding), round-trip error bounded
    by half a step."""
    if not native.native_available():
        pytest.skip("native library unavailable")
    x16 = (rng.standard_normal((3, 1, 5000)) * 9000).astype(np.int16)
    x16[0, 0, 7] = -32768  # abs-overflow corner
    x16[2] = 0  # silent clip
    q, step = native.quant_i8(x16)
    assert q.shape == x16.shape and q.dtype == np.int8
    a = np.abs(x16.astype(np.int32)).max(axis=(1, 2)).astype(np.float32)
    s = np.maximum(a, 1.0) / 127.0
    np.testing.assert_allclose(step, s, rtol=1e-6)
    qn = np.clip(np.round(x16.astype(np.float32) / s[:, None, None]), -127, 127)
    assert np.abs(q.astype(np.int32) - qn.astype(np.int32)).max() <= 1
    err = np.abs(q.astype(np.float32) * step[:, None, None] - x16.astype(np.float32))
    assert (err <= step[:, None, None] / 2 + 0.1).all()
