"""Export a trained checkpoint as a standalone serving artifact (.aytx).

Lowered via ``jax.export``: one StableHLO program holding the folded
inference graph (frontend -> backbone -> neck -> decode -> NMS) with the
weights baked in, runnable on TPU or CPU by any compatible JAX runtime with
no model code (see ``audioyolo_tpu/infer/export.py``). The reference has no
deployment artifact beyond a code-coupled ``state_dict``
(``/root/reference/inference.py:23-31``).

Usage:
  python tools/export_model.py --config config/config.yaml \
      --output model.aytx [--batch_size 32] [--int16] [--framed] [--bf16] \
      [--model_path ...] [--class_map_path ...] [--platforms tpu,cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from audioyolo_tpu.config import load_config  # noqa: E402
from audioyolo_tpu.infer.export import (  # noqa: E402
    build_serving_exported,
    save_serving_artifact,
)
from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg  # noqa: E402


def main() -> None:
    p = argparse.ArgumentParser(description="Export serving artifact")
    p.add_argument("--config", type=str, default="config/config.yaml", metavar="")
    p.add_argument("--model_path", type=str, default="", metavar="")
    p.add_argument("--class_map_path", type=str, default="", metavar="")
    p.add_argument("--output", type=str, required=True, metavar="")
    p.add_argument("--batch_size", type=int, default=0, metavar="")
    p.add_argument("--iou_threshold", type=float, default=0.1, metavar="")
    p.add_argument("--conf_threshold", type=float, default=0.2, metavar="")
    p.add_argument("--platforms", type=str, default="tpu,cpu", metavar="",
                   help="comma-separated lowering targets")
    p.add_argument("--int16", action="store_true",
                   help="export the PCM16-waveform entry (in-graph dequant)")
    p.add_argument("--framed", action="store_true",
                   help="export the phase-grouped-frames entry "
                        "(host runs SpectralFrontend.frame_host)")
    p.add_argument("--bf16", action="store_true", help="bf16 detector body")
    p.add_argument("--int8_body", type=str, default="", metavar="",
                   help="wav file to calibrate an int8 detector body on; "
                        "the quantized form is baked into the artifact "
                        "(models/quant.py)")
    args = p.parse_args()

    from inference import get_label_map, load_model_variables

    cfg = load_config(args.config)
    tc = cfg.raw["train_config"]
    class_map_path = args.class_map_path or os.path.join(
        tc["class_map_path"], "class_map.json"
    )
    model_path = args.model_path or os.path.join(
        tc["model_path"], "AudioDetectionModel.msgpack"
    )
    batch_size = args.batch_size or int(tc["batch_size"])
    idx2class = get_label_map(class_map_path)

    dtype = jnp.bfloat16 if args.bf16 else None
    train_model = AudioDetectionModel.from_config(
        cfg, num_classes=len(idx2class), dtype=dtype
    )
    variables = fold_repvgg(load_model_variables(train_model, model_path))
    model = AudioDetectionModel.from_config(
        cfg, num_classes=len(idx2class), deploy=True, dtype=dtype
    )
    frame_shape = None
    framed_int8 = False
    frame_fn = None
    if args.framed:
        from audioyolo_tpu.ops.frontend import SpectralFrontend

        fe = SpectralFrontend(cfg)
        if fe.fused is None:
            raise SystemExit("--framed: fused frontend ineligible for this config")
        # with tpu_config.frontend_precision: int8 the framed entry is the
        # (q int8, scale f32) tuple of frame_host_int8 — the serving
        # headline posture; the exporter follows the config automatically
        framed_int8 = fe.fused_int8
        frame_fn = fe.frame_host_int8 if framed_int8 else fe.frame_host
        sample = fe.frame_host(
            __import__("numpy").zeros((1, int(cfg.clip_samples)),
                                      "int16" if args.int16 else "float32")
        )
        frame_shape = tuple(sample.shape[1:])

    if args.int8_body:
        from inference import load_calib_batch
        from audioyolo_tpu.models.quant import calibrate_quant

        # calibrate through the SAME entry the artifact will serve
        calib = load_calib_batch([args.int8_body], cfg, frame_fn=frame_fn)
        variables = {**variables, "quant": calibrate_quant(model, variables, [calib])}

    input_dtype = ("int8" if framed_int8
                   else "int16" if args.int16 else "float32")
    exported = build_serving_exported(
        model,
        variables,
        batch_size,
        iou_threshold=args.iou_threshold,
        conf_threshold=args.conf_threshold,
        keep_k=int(cfg.raw.get("tpu_config", {}).get("nms_keep", 128)),
        input_dtype=input_dtype,
        framed=args.framed,
        frame_shape=frame_shape,
        platforms=[s.strip() for s in args.platforms.split(",") if s.strip()],
    )
    save_serving_artifact(
        args.output,
        exported,
        idx2class_map=idx2class,
        sample_duration=float(cfg.sample_duration),
        input_sample_rate=int(cfg.sample_rate),
        extra_meta={
            "iou_threshold": args.iou_threshold,
            "conf_threshold": args.conf_threshold,
            "framed": bool(args.framed),
            "body_dtype": "bfloat16" if args.bf16 else "float32",
            "int8_body": bool(args.int8_body),
        },
    )
    sz = os.path.getsize(args.output)
    print(f"wrote {args.output} ({sz/1e6:.1f} MB, platforms="
          f"{args.platforms}, input={'framed ' if args.framed else ''}"
          f"{input_dtype} batch={batch_size})")


if __name__ == "__main__":
    main()
