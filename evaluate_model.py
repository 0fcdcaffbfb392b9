"""Event-mAP evaluation over an annotated dataset split.

The reference logs only cell-level classification metrics inside its loss
(``modules/_loss.py:167-173``) and never computes detection mAP; BASELINE.md
requires an event-mAP evaluator to demonstrate parity. This CLI runs the
detector over every annotated window of a split, matches predicted
``(start, end, class, confidence)`` events to ground-truth events by 1-D
interval IoU (greedy, per class), and reports AP@0.5 / AP@[.5:.95] plus
per-class APs as one JSON object.

Ground truth uses the same time convention as the training targets (the
window's annotated span; see data/dataset.py notes), so the number measures
exactly the task the model was trained on.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from audioyolo_tpu.config import load_config
from audioyolo_tpu.data import AudioDataset, BatchLoader
from audioyolo_tpu.infer import postprocess_detections
from audioyolo_tpu.infer.eval_map import event_map
from inference import build_inference, get_label_map
from train import load_annotations


def main():
    parser = argparse.ArgumentParser(description="Event-mAP evaluation")
    parser.add_argument("--config", type=str, default="config/config.yaml", metavar="")
    parser.add_argument("--dataset_path", type=str, required=True, metavar="",
                        help="dataset root containing eval/ and annotations/")
    parser.add_argument("--split", type=str, default="eval", metavar="")
    parser.add_argument("--annotator", type=str, default="", metavar="")
    parser.add_argument("--class_map_path", type=str, default="", metavar="")
    parser.add_argument("--model_path", type=str, default="", metavar="")
    parser.add_argument("--batch_size", type=int, default=0, metavar="")
    parser.add_argument("--iou_threshold", type=float, default=0.1, metavar="",
                        help="NMS IoU threshold")
    parser.add_argument("--conf_threshold", type=float, default=0.05, metavar="",
                        help="confidence floor for scored detections")
    parser.add_argument("--int8", action="store_true",
                        help="int8 detector body, scales calibrated on the "
                             "first split files (models/quant.py)")
    parser.add_argument("--framed_input", action="store_true",
                        help="host-frame clips for the fused frontend "
                             "(with tpu_config.frontend_precision: int8 this "
                             "exercises the int8-DFT framed entry — the "
                             "serving headline posture)")
    args = parser.parse_args()

    cfg = load_config(args.config)
    tc = cfg.raw["train_config"]
    annotator = args.annotator or tc["annotator"]
    class_map_path = args.class_map_path or os.path.join(tc["class_map_path"], "class_map.json")
    model_path = args.model_path or os.path.join(tc["model_path"], "AudioDetectionModel.msgpack")
    batch_size = args.batch_size or int(tc["batch_size"])
    max_targets = int(cfg.raw.get("tpu_config", {}).get("max_targets", 48))

    idx2class = get_label_map(class_map_path)
    num_classes = len(idx2class)
    class2idx = {v: k for k, v in idx2class.items()}

    annotations = load_annotations(args.dataset_path, annotator)
    ds = AudioDataset(
        os.path.join(args.dataset_path, args.split),
        annotations,
        sample_duration=cfg.sample_duration,
        sample_rate=cfg.sample_rate,
        extension=cfg.raw["audio_extension"],
        max_targets=max_targets,
    )
    ds.class2idx = class2idx  # evaluate against the training vocabulary

    frame_fn = None
    if args.framed_input:
        from inference import build_frame_fn

        frame_fn = build_frame_fn(cfg)
    int8_calib = None
    if args.int8:
        from inference import load_calib_batch

        int8_calib = load_calib_batch(
            [ds.audio_span(i)[0] for i in range(min(4, len(ds)))], cfg,
            frame_fn=frame_fn,
        )
    infer_fn = build_inference(
        cfg, num_classes, model_path, args.iou_threshold, args.conf_threshold,
        int8_calib=int8_calib,
    )

    from audioyolo_tpu.infer.decode import unpack_detections

    detections, ground_truth = [], []
    tpu_cfg = cfg.raw.get("tpu_config", {})
    transfer_dtype = tpu_cfg.get("transfer_dtype", "float32")
    loader = BatchLoader(ds, batch_size, shuffle=False, last_batch="partial",
                         transfer_dtype=transfer_dtype)
    # small corpora go device-resident (one bulk ship + on-device gathers
    # instead of per-batch puts through the possibly-degraded tunnel) — the
    # same DeviceCachedLoader demo training uses (data/loader.py)
    if frame_fn is None:  # host framing needs host-resident audio
        from audioyolo_tpu.data.loader import DeviceCachedLoader

        loader = DeviceCachedLoader.wrap_from_config(loader, tpu_cfg)
    clip = 0
    for batch in loader:
        import jax

        audio = batch["audio"]
        if frame_fn is not None:
            a = np.asarray(audio)
            audio = frame_fn(a[:, 0, :] if a.ndim == 3 else a)
        out = infer_fn(jax.device_put(audio))
        dets = (
            unpack_detections(np.asarray(out))
            if not isinstance(out, dict)
            else {k: np.asarray(v) for k, v in out.items()}
        )
        rows = postprocess_detections(dets, cfg.sample_duration, return_start_end=True)
        b = batch["audio"].shape[0]
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

    thresholds = [round(t, 2) for t in np.arange(0.5, 0.96, 0.05)]
    result = event_map(detections, ground_truth, num_classes, iou_thresholds=thresholds)
    result["mAP@[.5:.95]"] = result.pop("mAP")
    result["num_detections"] = len(detections)
    result["num_ground_truth"] = len(ground_truth)
    per_class = {}
    from audioyolo_tpu.infer.eval_map import event_average_precision

    for c in range(num_classes):
        ap = event_average_precision(detections, ground_truth, c, 0.5)
        per_class[idx2class[c]] = None if np.isnan(ap) else round(float(ap), 4)
    result["AP50_per_class"] = per_class
    print(json.dumps(result, default=float))


if __name__ == "__main__":
    main()
