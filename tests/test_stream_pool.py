"""Multi-process streaming pool (infer/pool.py): sharded results must be
byte-identical to the single-process streaming path.

The pool exists because the host->device transfer cap that bounds
single-process streaming is per-process (docs/PERFORMANCE.md); these tests
verify the *semantics* on the CPU backend — chunk-range sharding of one
file and file sharding of a directory both reproduce the single-process
CSVs exactly.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

import pool_factory
from synth import synth_clip

from audioyolo_tpu.data.wavio import write_wav
from audioyolo_tpu.infer import evaluate_audio
from audioyolo_tpu.infer.pool import StreamWorkerPool

# compile-heavy / multi-process: excluded from the fast tier (-m 'not slow')
pytestmark = pytest.mark.slow

EVAL_KWARGS = dict(
    input_sample_rate=8000,
    sample_duration=4.0,
    batch_size=2,
    idx2class_map={0: "tone", 1: "beep"},
)
WORKER_ENV = {
    "AYT_WORKER_PLATFORM": "cpu",
    "PYTHONPATH": os.path.dirname(os.path.abspath(__file__)),
}


def _long_wav(path: str, seconds: float, seed: int) -> None:
    events = [(2.0 + 6 * i, 4.5 + 6 * i, ["tone", "beep"][i % 2])
              for i in range(int(seconds // 6) - 1)]
    write_wav(path, synth_clip(8000, seconds, events, seed=seed), 8000)


@pytest.fixture(scope="module")
def pool():
    p = StreamWorkerPool(
        "pool_factory:build", {"seed": 0}, workers=2,
        eval_kwargs=EVAL_KWARGS, env=WORKER_ENV,
    )
    p.warmup()
    yield p
    p.close()


def test_pool_single_file_matches_single_process(pool, tmp_path):
    """One long file sharded by chunk ranges across 2 workers -> identical
    CSV to the in-process evaluate_audio (global sort + RLE merge parity)."""
    wav = str(tmp_path / "long.wav")
    _long_wav(wav, 40.0, seed=5)  # 10 windows of 4 s -> 5 chunks of 2

    infer_fn, _ = pool_factory.build(seed=0)
    out_single = str(tmp_path / "single")
    os.makedirs(out_single)
    evaluate_audio(infer_fn, wav, out_single, **EVAL_KWARGS)

    out_pool = str(tmp_path / "pooled")
    csv_path = pool.evaluate_file(wav, out_pool)
    single_csv = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out_single) for f in fs if f.endswith(".csv")
    ][0]
    with open(single_csv) as a, open(csv_path) as b:
        assert a.read() == b.read()


def test_pool_uneven_tail_chunk(pool, tmp_path):
    """A file whose last chunk is partial (and window padded) must still
    match: exercises the end_frame clamp in evaluate_audio's chunk_range."""
    wav = str(tmp_path / "odd.wav")
    _long_wav(wav, 27.0, seed=9)  # 6.75 windows -> 7 windows -> 4 chunks

    infer_fn, _ = pool_factory.build(seed=0)
    rows_single = evaluate_audio(infer_fn, wav, "", return_rows=True, **EVAL_KWARGS)

    out_pool = str(tmp_path / "pooled")
    csv_path = pool.evaluate_file(wav, out_pool)
    from audioyolo_tpu.infer.streaming import write_rows_csv

    out_single = str(tmp_path / "single")
    ref_csv = write_rows_csv(rows_single, EVAL_KWARGS["idx2class_map"], wav, out_single)
    with open(ref_csv) as a, open(csv_path) as b:
        assert a.read() == b.read()


def test_pool_directory_matches_per_file(pool, tmp_path):
    """Directory sharded by files across workers -> same per-file CSVs as
    the in-process path."""
    adir = tmp_path / "clips"
    adir.mkdir()
    paths = []
    for i, dur in enumerate([10.0, 14.0, 9.0]):
        p = str(adir / f"f{i}.wav")
        _long_wav(p, dur, seed=20 + i)
        paths.append(p)

    infer_fn, _ = pool_factory.build(seed=0)
    out_single = str(tmp_path / "single")
    for p in paths:
        evaluate_audio(infer_fn, p, out_single, **EVAL_KWARGS)

    out_pool = str(tmp_path / "pooled")
    n = pool.evaluate_dir(paths, out_pool)
    assert n == 3
    for i in range(3):
        a_path = os.path.join(out_single, "clips", f"f{i}_results.csv")
        b_path = os.path.join(out_pool, "clips", f"f{i}_results.csv")
        with open(a_path) as a, open(b_path) as b:
            assert a.read() == b.read(), f"f{i} CSVs differ"


def test_pool_single_file_non_native_rate(pool, tmp_path):
    """A file at half the model rate: chunk indices are defined in the
    file's NATIVE rate (streaming.py:76-84), so the pool must size its
    chunk spans from the WAV header rate — sizing them at the model rate
    under-counts chunks and silently drops the tail of the file."""
    wav = str(tmp_path / "slow.wav")
    events = [(2.0 + 6 * i, 4.5 + 6 * i, ["tone", "beep"][i % 2])
              for i in range(5)]  # events through ~34.5 s
    write_wav(wav, synth_clip(4000, 40.0, events, seed=11), 4000)

    infer_fn, _ = pool_factory.build(seed=0)
    out_single = str(tmp_path / "single")
    os.makedirs(out_single)
    evaluate_audio(infer_fn, wav, out_single, **EVAL_KWARGS)

    out_pool = str(tmp_path / "pooled")
    csv_path = pool.evaluate_file(wav, out_pool)
    single_csv = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out_single) for f in fs if f.endswith(".csv")
    ][0]
    with open(single_csv) as a, open(csv_path) as b:
        assert a.read() == b.read()


def test_pool_directory_corrupt_file_isolated(pool, tmp_path):
    """One unreadable file must not abort its worker's shard: the readable
    files are processed and written first, then the failure is surfaced."""
    adir = tmp_path / "mixed"
    adir.mkdir()
    good = []
    for i in range(3):
        p = str(adir / f"g{i}.wav")
        _long_wav(p, 9.0 + i, seed=40 + i)
        good.append(p)
    bad = str(adir / "bad.wav")
    with open(bad, "wb") as f:
        f.write(b"RIFFgarbage-not-a-wav")

    out = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="bad.wav"):
        pool.evaluate_dir(good + [bad], out)
    # every readable file still produced its CSV before the raise
    for i in range(3):
        assert os.path.isfile(os.path.join(out, "mixed", f"g{i}_results.csv"))


def test_pool_framed_int8_matches_single_process(tmp_path):
    """Framed-int8 streaming (``transfer='int8'`` + quantizing frame_fn —
    clips ship as (q, scale) tuples into the model's int8-DFT entry): the
    pooled chunk-sharded result must be byte-identical to the in-process
    evaluate_audio on the same posture. (Accuracy of the int8-DFT frontend
    itself is gated on the trained model — docs/PERFORMANCE.md round 4;
    this test pins the plumbing.)"""
    wav = str(tmp_path / "long.wav")
    _long_wav(wav, 40.0, seed=31)

    infer_fn, frame_fn = pool_factory.build(seed=0, framed_int8=True)
    assert frame_fn is not None
    out_single = str(tmp_path / "single")
    os.makedirs(out_single)
    evaluate_audio(infer_fn, wav, out_single, frame_fn=frame_fn,
                   transfer="int8", **EVAL_KWARGS)

    with StreamWorkerPool(
        "pool_factory:build", {"seed": 0, "framed_int8": True}, workers=2,
        eval_kwargs={**EVAL_KWARGS, "transfer": "int8"}, env=WORKER_ENV,
    ) as p:
        out_pool = str(tmp_path / "pooled")
        csv_path = p.evaluate_file(wav, out_pool)

    single_csv = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out_single) for f in fs if f.endswith(".csv")
    ][0]
    with open(single_csv) as a, open(csv_path) as b:
        assert a.read() == b.read()


def test_framed_int8_requires_quantizing_framer(tmp_path):
    """transfer='int8' with a NON-quantizing frame_fn must fail loudly, not
    silently ship int16 frames under an int8 flag."""
    wav = str(tmp_path / "w.wav")
    _long_wav(wav, 8.0, seed=33)
    infer_fn, _ = pool_factory.build(seed=0)
    from audioyolo_tpu.ops.frontend import SpectralFrontend
    import copy

    from conftest import TINY_CFG
    from audioyolo_tpu.config import Config

    plain_framer = SpectralFrontend(Config(copy.deepcopy(TINY_CFG))).frame_host
    with pytest.raises(ValueError, match="quantizing framer"):
        evaluate_audio(infer_fn, wav, str(tmp_path), frame_fn=plain_framer,
                       transfer="int8", **EVAL_KWARGS)


def test_pool_detect_regime_two_phase(pool):
    """The prep/go start barrier (round-4 advisor): detect_regime must
    return coherent fields, and the concurrent phase's per-worker reports
    must carry comparable wall-clock epochs (t0 < t1)."""
    regime = pool.detect_regime(mb=2.0)
    assert regime is pool.regime
    assert regime["regime"] in ("per-process", "global", "partial", "single")
    assert 1 <= regime["active_workers"] <= pool.workers
    assert regime["solo_mbps"] is None or regime["solo_mbps"] > 0
    assert regime["aggregate_mbps"] is None or regime["aggregate_mbps"] > 0


def test_prefetch_iter_producer_exits_when_consumer_abandons():
    """Abandoning the consumer mid-iteration (generator .close(), as happens
    when infer_fn raises inside evaluate_audio) must unblock and terminate
    the producer thread — long-lived pool workers previously leaked one
    blocked thread plus queued chunks per failed call (round-4 advisor)."""
    import threading
    import time

    from audioyolo_tpu.infer.streaming import _prefetch_iter

    n0 = threading.active_count()
    closed = []

    def gen():
        try:
            for i in range(10_000):
                yield i
        finally:
            closed.append(True)

    it = _prefetch_iter(gen(), depth=1)
    assert next(it) == 0
    it.close()  # consumer walks away with the producer blocked on a full queue
    deadline = time.time() + 10.0
    while threading.active_count() > n0 and time.time() < deadline:
        time.sleep(0.02)
    assert threading.active_count() == n0, "producer thread leaked"
    assert closed, "source generator was not closed"


def test_prefetch_iter_consumer_sees_producer_error():
    from audioyolo_tpu.infer.streaming import _prefetch_iter

    def gen():
        yield 1
        raise ValueError("boom")

    it = _prefetch_iter(gen(), depth=2)
    assert next(it) == 1
    with pytest.raises(ValueError, match="boom"):
        list(it)


def test_pool_int8_transfer_matches_int16_on_8bit_content(tmp_path):
    """Pooled streaming with ``transfer='int8'`` (the bench's production
    posture for transfer-bound deployments) must reproduce the int16 path's
    CSV exactly on exactly-int8-representable content: samples are multiples
    of 258 = 32766/127 with a full-scale sample in every window, so the
    per-clip scale is binary-exact and q * scale == the int16 floats
    (mirrors test_inference_e2e.py's single-process equality; here the
    factory kwarg + eval_kwargs plumbing through the worker is what's under
    test)."""
    sr = EVAL_KWARGS["input_sample_rate"]
    dur = 16.0  # 4 windows of 4 s -> 2 chunks of 2
    rng = np.random.default_rng(13)
    x16 = 258 * rng.integers(-127, 128, int(sr * dur)).astype(np.int32)
    for k in range(4):
        x16[k * 4 * sr] = 32766
    wav = str(tmp_path / "exact8.wav")
    write_wav(wav, x16.astype(np.float32) / 32768.0, sr)

    infer_fn, _ = pool_factory.build(seed=0)
    out_single = str(tmp_path / "single")
    os.makedirs(out_single)
    evaluate_audio(infer_fn, wav, out_single, transfer="int16", **EVAL_KWARGS)

    with StreamWorkerPool(
        "pool_factory:build", {"seed": 0, "int8_input": True}, workers=2,
        eval_kwargs={**EVAL_KWARGS, "transfer": "int8"}, env=WORKER_ENV,
    ) as p8:
        out_pool = str(tmp_path / "pooled")
        csv_path = p8.evaluate_file(wav, out_pool)

    single_csv = [
        os.path.join(r, f)
        for r, _, fs in os.walk(out_single) for f in fs if f.endswith(".csv")
    ][0]
    with open(single_csv) as a, open(csv_path) as b:
        assert a.read() == b.read()
