"""HTTP serving endpoint (serve.py): health/meta/detect round-trip against
a live ThreadingHTTPServer with the tiny deterministic model."""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

import pool_factory
from synth import synth_clip

import serve as serve_mod
from audioyolo_tpu.data.wavio import write_wav

# compile-heavy / multi-process: excluded from the fast tier (-m 'not slow')
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    import copy

    from conftest import TINY_CFG
    from audioyolo_tpu.config import Config

    infer_fn, _ = pool_factory.build(seed=0)
    cfg = Config(copy.deepcopy(TINY_CFG))
    state = {
        "cfg": cfg,
        "idx2class": {0: "tone", 1: "beep"},
        "infer_fn": infer_fn,
        "frame_fn": None,
        "batch_size": 2,
        "lock": threading.Lock(),
        "config_path": "<tiny>",
    }
    httpd = serve_mod.serve(state, "127.0.0.1", 0)
    port = httpd.server_address[1]
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{port}"
    httpd.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_health_and_meta(server):
    status, body = _get(server + "/health")
    assert status == 200 and body == {"status": "ok"}
    status, body = _get(server + "/meta")
    assert status == 200
    assert body["classes"] == {"0": "tone", "1": "beep"}
    assert body["input_sample_rate"] == 8000


def test_detect_roundtrip(server, tmp_path):
    """POST a 12 s synthetic WAV; response rows/events must be well-formed,
    time-ordered, and events RLE-merged."""
    wav_path = str(tmp_path / "c.wav")
    events = [(1.0, 2.5, "tone"), (4.0, 5.5, "beep"), (9.0, 10.5, "tone")]
    write_wav(wav_path, synth_clip(8000, 12.0, events, seed=3), 8000)
    with open(wav_path, "rb") as f:
        body = f.read()
    req = urllib.request.Request(server + "/detect", data=body, method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        assert r.status == 200
        out = json.loads(r.read())
    assert set(out) == {"events", "rows"}
    rows = out["rows"]
    assert rows, "no detections from the tiny model"
    starts = [r["start"] for r in rows]
    assert starts == sorted(starts)
    for r in rows:
        assert r["class"] in ("tone", "beep") and 0.0 <= r["confidence"] <= 1.0
    ev = out["events"]
    for a, b in zip(ev, ev[1:]):
        assert a["class"] != b["class"], "events must be RLE-merged"


def test_detect_bad_body(server):
    req = urllib.request.Request(
        server + "/detect", data=b"not a wav", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=60)
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read())


def test_unknown_path(server):
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(server + "/nope", timeout=60)
    assert ei.value.code == 404
