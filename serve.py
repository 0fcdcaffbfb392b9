"""HTTP serving endpoint for audio activity detection.

A minimal stdlib-only production front: POST a WAV (any sample rate, any
duration — the streaming chunker windows it) and get the detected
``(start, end, class)`` events as JSON. The reference ships no serving
surface at all (its deployment story is the ``inference.py`` CLI,
``/root/reference/inference.py:239-325``); this wraps the same compiled
inference function the CLI uses — folded RepVGG, packed detection fetch,
optional bf16 / int8 body — behind a long-lived process so model build and
compile are paid once.

Endpoints:
  GET  /health          -> {"status": "ok"}
  GET  /meta            -> class map, sample rates, model config path
  POST /detect          -> body: WAV bytes.
       Response: {"events": [{"start": s, "end": s, "class": name}, ...],
                  "rows":   [{"start", "end", "class", "confidence"}, ...]}
       "events" are the RLE-merged class segments (identical semantics to
       the CLI's CSV); "rows" are the raw per-detection intervals.

Requests are served sequentially (one device; the jitted function is the
bottleneck, not the HTTP layer). For parallel bulk ingest use the CLI's
``--workers`` process pool instead.

Usage:
  python serve.py --config config/config.yaml [--port 8700] [--bf16] \
      [--int8_calib calib.wav]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from audioyolo_tpu.config import load_config
from audioyolo_tpu.infer.streaming import evaluate_audio, rle_merge


def build_app_state(args) -> dict:
    """Load model + build the compiled inference fn once, return app state."""
    from inference import (
        build_frame_fn,
        build_inference,
        get_label_map,
        load_calib_batch,
    )

    cfg = load_config(args.config)
    tc = cfg.raw["train_config"]
    class_map_path = args.class_map_path or os.path.join(
        tc["class_map_path"], "class_map.json"
    )
    model_path = args.model_path or os.path.join(
        tc["model_path"], "AudioDetectionModel.msgpack"
    )
    idx2class = get_label_map(class_map_path)
    import jax.numpy as jnp

    frame_fn = build_frame_fn(cfg) if args.framed_input else None
    int8_calib = (
        load_calib_batch([args.int8_calib], cfg, frame_fn=frame_fn)
        if args.int8_calib else None
    )
    infer_fn = build_inference(
        cfg, len(idx2class), model_path, args.iou_threshold,
        args.conf_threshold, dtype=jnp.bfloat16 if args.bf16 else None,
        int8_calib=int8_calib,
    )
    return {
        "cfg": cfg,
        "idx2class": idx2class,
        "infer_fn": infer_fn,
        "frame_fn": frame_fn,
        "batch_size": args.batch_size or int(tc["batch_size"]),
        "lock": threading.Lock(),
        "config_path": args.config,
        # persistent polyphase-kernel cache: rebuilding the sinc matrix per
        # non-native-rate request would waste the 1-core host inside the
        # serialized infer region (same pattern as infer/_pool_worker.py)
        "resampler_cache": {},
    }


def detect_wav_bytes(state: dict, body: bytes) -> dict:
    """Run detection on in-memory WAV bytes -> JSON-ready dict."""
    cfg = state["cfg"]
    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(body)
        path = f.name
    try:
        with state["lock"]:  # one device; serialize infer calls
            rows = evaluate_audio(
                state["infer_fn"], path, "",
                input_sample_rate=int(cfg.sample_rate),
                sample_duration=float(cfg.sample_duration),
                batch_size=state["batch_size"],
                idx2class_map=state["idx2class"],
                frame_fn=state["frame_fn"],
                return_rows=True,
                _resampler_cache=state.get("resampler_cache"),
            )
    finally:
        os.unlink(path)
    idx2class = state["idx2class"]
    raw = [
        {
            "start": round(r["start"], 2),
            "end": round(r["end"], 2),
            "class": idx2class[r["class_idx"]],
            "confidence": round(r["confidence"], 4),
        }
        for r in rows
    ]
    events = [
        {"start": e["start"], "end": e["end"], "class": e["class"]}
        for e in rle_merge(raw)
    ]
    return {"events": events, "rows": raw}


def make_handler(state: dict):
    class Handler(BaseHTTPRequestHandler):
        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 (stdlib naming)
            if self.path == "/health":
                self._json(200, {"status": "ok"})
            elif self.path == "/meta":
                cfg = state["cfg"]
                self._json(200, {
                    "classes": state["idx2class"],
                    "input_sample_rate": int(cfg.sample_rate),
                    "sample_duration": float(cfg.sample_duration),
                    "config": state["config_path"],
                })
            else:
                self._json(404, {"error": f"unknown path {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/detect":
                self._json(404, {"error": f"unknown path {self.path}"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                if n <= 0:
                    raise ValueError("empty body (expected WAV bytes)")
                body = self.rfile.read(n)
                self._json(200, detect_wav_bytes(state, body))
            except Exception as e:  # surface the error as JSON, keep serving
                self._json(400, {"error": f"{type(e).__name__}: {e}"})

        def log_message(self, fmt, *a):  # quiet access log
            pass

    return Handler


def serve(state: dict, host: str, port: int) -> ThreadingHTTPServer:
    httpd = ThreadingHTTPServer((host, port), make_handler(state))
    return httpd


def main() -> None:
    p = argparse.ArgumentParser(description="Audio detection HTTP server")
    p.add_argument("--config", type=str, default="config/config.yaml", metavar="")
    p.add_argument("--class_map_path", type=str, default="", metavar="")
    p.add_argument("--model_path", type=str, default="", metavar="")
    p.add_argument("--host", type=str, default="127.0.0.1", metavar="")
    p.add_argument("--port", type=int, default=8700, metavar="")
    p.add_argument("--batch_size", type=int, default=0, metavar="")
    p.add_argument("--iou_threshold", type=float, default=0.1, metavar="")
    p.add_argument("--conf_threshold", type=float, default=0.2, metavar="")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--framed_input", action="store_true")
    p.add_argument("--int8_calib", type=str, default="", metavar="",
                   help="wav file to calibrate an int8 detector body on")
    args = p.parse_args()

    state = build_app_state(args)
    httpd = serve(state, args.host, args.port)
    print(f"serving on http://{args.host}:{args.port} "
          f"(classes: {list(state['idx2class'].values())})")
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        httpd.shutdown()


if __name__ == "__main__":
    main()
