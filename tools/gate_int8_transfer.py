"""Detection-equivalence gate for the int8 waveform transfer.

Runs the demo eval split through the SAME trained checkpoint twice — once
via the exact int16 waveform entry, once via the lossy int8 ``(q, scale)``
entry (`infer/streaming.py::quantize_clips_int8`, ~48 dB SNR) — and reports
event mAP@0.5 / mAP@[.5:.95] for both plus a row-level event diff. The
bench streaming posture only adopts ``transfer='int8'`` if this gate shows
detection equivalence (docs/PERFORMANCE.md "int8 waveform transfer").

Usage (train.py writes the class map to the cwd-relative
``train_config.class_map_path`` — the repo-root ``idx2class_mapping/`` for
the shipped config, regardless of where the model checkpoint lands):
    python tools/gate_int8_transfer.py --dataset_path /tmp/demo_ds \
        --model_path /tmp/demo_run/saved_model/AudioDetectionModel.msgpack \
        --class_map idx2class_mapping/class_map.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audioyolo_tpu.config import load_config  # noqa: E402
from audioyolo_tpu.data import AudioDataset, BatchLoader  # noqa: E402
from train import load_annotations  # noqa: E402
from audioyolo_tpu.infer.decode import unpack_detections  # noqa: E402
from audioyolo_tpu.infer import postprocess_detections  # noqa: E402
from audioyolo_tpu.infer.eval_map import event_map, event_average_precision  # noqa: E402
from audioyolo_tpu.infer.streaming import (  # noqa: E402
    quantize_clips_int8,
    quantize_clips_int8_device,
)


def run_split(infer_fn, loader, cfg, int8: bool):
    import jax

    detections, ground_truth = [], []
    clip = 0
    for batch in loader:
        audio = batch["audio"]
        if int8:
            if isinstance(audio, jax.Array):
                # device-cached loader: quantize in-graph — a host
                # quantize here would re-fetch the whole split through
                # the (possibly degraded) tunnel every gate run
                out = infer_fn(quantize_clips_int8_device(audio))
            else:
                q, scale = quantize_clips_int8(np.asarray(audio))
                out = infer_fn((jax.device_put(q), jax.device_put(scale)))
        else:
            out = infer_fn(jax.device_put(audio))
        dets = (
            unpack_detections(np.asarray(out))
            if not isinstance(out, dict)
            else {k: np.asarray(v) for k, v in out.items()}
        )
        rows = postprocess_detections(dets, cfg.sample_duration, return_start_end=True)
        b = audio.shape[0]
        for i in range(b):
            fid = clip + i
            for conf, _obj, cls, start, end in rows[i]:
                detections.append((fid, cls, conf, start, end))
            mask = batch["valid"][i] & (batch["classes"][i] != -100)
            for j in np.nonzero(mask)[0]:
                c = float(batch["centers"][i, j])
                w = float(batch["widths"][i, j])
                ground_truth.append((fid, int(batch["classes"][i, j]), c - w / 2, c + w / 2))
        clip += b
    return detections, ground_truth


def summarize(name, detections, ground_truth, num_classes, idx2class):
    thresholds = [round(t, 2) for t in np.arange(0.5, 0.96, 0.05)]
    result = event_map(detections, ground_truth, num_classes, iou_thresholds=thresholds)
    out = {
        "entry": name,
        "mAP@0.5": result.get("mAP@0.5"),
        "mAP@[.5:.95]": result.get("mAP"),
        "num_detections": len(detections),
    }
    for c in range(num_classes):
        ap = event_average_precision(detections, ground_truth, c, 0.5)
        out[f"AP50_{idx2class[c]}"] = None if np.isnan(ap) else round(float(ap), 4)
    return out


def row_diff(a, b, tol_t=0.05, tol_conf=0.02):
    """Count events present in one list but unmatched in the other (same
    file+class, |start/end| within tol_t s, |conf| within tol_conf)."""
    unmatched = 0
    used = set()
    for fid, cls, conf, s, e in a:
        hit = None
        for j, (fid2, cls2, conf2, s2, e2) in enumerate(b):
            if j in used or fid2 != fid or cls2 != cls:
                continue
            if abs(s - s2) <= tol_t and abs(e - e2) <= tol_t and abs(conf - conf2) <= tol_conf:
                hit = j
                break
        if hit is None:
            unmatched += 1
        else:
            used.add(hit)
    return unmatched + (len(b) - len(used))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/config.yaml")
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--split", default="eval")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--class_map", required=True)
    ap.add_argument("--conf_threshold", type=float, default=0.05)
    ap.add_argument("--iou_threshold", type=float, default=0.1)
    args = ap.parse_args()

    from inference import build_inference  # noqa: E402  (repo-root CLI import)

    cfg = load_config(args.config)
    idx2class = {int(k): v for k, v in json.load(open(args.class_map)).items()}
    num_classes = len(idx2class)
    class2idx = {v: k for k, v in idx2class.items()}

    annotations = load_annotations(args.dataset_path, cfg.raw["train_config"]["annotator"])
    ds = AudioDataset(
        os.path.join(args.dataset_path, args.split), annotations,
        sample_duration=cfg.sample_duration, sample_rate=cfg.sample_rate,
        extension=cfg.raw["audio_extension"],
        max_targets=int(cfg.raw.get("tpu_config", {}).get("max_targets", 48)),
    )
    ds.class2idx = class2idx

    # device-resident split (data/loader.py::DeviceCachedLoader): the audio
    # ships through the tunnel ONCE and both postures (and every re-run of
    # the gate in one process) read it from HBM — round-4 demo epochs cost
    # 90-400 s each when the pipe degraded; gates must stay cheap enough to
    # run on every posture change (round-4 verdict item 5)
    from audioyolo_tpu.data.loader import DeviceCachedLoader

    loader = BatchLoader(ds, 16, shuffle=False, last_batch="partial",
                         transfer_dtype="int16")
    loader = DeviceCachedLoader.wrap_from_config(
        loader, cfg.raw.get("tpu_config", {}))

    results = []
    dets = {}
    for int8 in (False, True):
        infer_fn = build_inference(
            cfg, num_classes, args.model_path, args.iou_threshold,
            args.conf_threshold, int8_input=int8,
        )
        d, gt = run_split(infer_fn, loader, cfg, int8)
        name = "int8" if int8 else "int16"
        dets[name] = d
        results.append(summarize(name, d, gt, num_classes, idx2class))

    diff = row_diff(dets["int16"], dets["int8"])
    print(json.dumps({"results": results, "row_diff_unmatched": diff}, default=float))


if __name__ == "__main__":
    main()
