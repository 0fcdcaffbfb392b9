"""Inference entry point (CLI surface of reference ``inference.py:239-325``).

Loads a trained checkpoint, folds every RepVGG block into its single-conv
deploy form (the reference ships this fold but never invokes it from its CLI —
SURVEY.md §3.3; here it is the default), compiles one waveform->detections XLA
graph, and streams single files or directories into per-file
``{start, end, class}`` CSVs.

Fixed reference quirks (documented): ``--iou_threshold``/``--conf_threshold``
are floats (the reference declared them ``type=int``, truncating CLI values,
``inference.py:288,292``).
"""

from __future__ import annotations

import argparse
import json
import os

import jax.numpy as jnp
from flax import serialization

from audioyolo_tpu.config import load_config
from audioyolo_tpu.infer import evaluate_audio, evaluate_dir, make_inference_fn
from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg


def get_label_map(path: str):
    with open(path, "r") as f:
        return {int(k): v for k, v in json.load(f).items()}


def load_model_variables(model: AudioDetectionModel, model_path: str):
    """Restore {params, batch_stats} from a trainer checkpoint (msgpack) or a
    reference PyTorch ``.pth``/``.pth.tar`` checkpoint (name-mapped import)."""
    if not os.path.isfile(model_path):
        raise FileNotFoundError(f"path: {model_path} does not exist")
    import jax

    # eval_shape: structure only, no device compute (restoring needs just the
    # pytree skeleton to validate the payload against)
    template = jax.eval_shape(
        lambda: model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 1, model.cfg.clip_samples), jnp.float32),
            train=False,
        )
    )
    if model_path.endswith((".pth", ".pth.tar", ".pt")):
        from audioyolo_tpu.models.import_torch import (
            import_torch_state_dict,
            load_torch_checkpoint,
        )

        return import_torch_state_dict(load_torch_checkpoint(model_path), template)

    with open(model_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(template["params"], payload["params"])
    batch_stats = serialization.from_state_dict(
        template.get("batch_stats", {}), payload.get("batch_stats", {})
    )
    return {"params": params, "batch_stats": batch_stats}


def build_inference(cfg, num_classes, model_path, iou_threshold, conf_threshold,
                    fold: bool = True, dtype=None, ref_exact: bool = False,
                    int8_calib=None, int8_input: bool = False):
    """``ref_exact=True`` runs imported reference checkpoints in the exact
    form they were trained/evaluated in: per-branch RepVGG LeakyReLU and no
    fold (the reference CLI never folds — SURVEY.md §3.3; and folding is not
    numerics-preserving under per-branch activation).

    ``int8_calib``: an optional model-input batch (waveform or framed); when
    given, the detector body runs int8 on the MXU with scales calibrated on
    it (models/quant.py — stem and prediction heads stay float; demo-model
    event mAP is unchanged, docs/PERFORMANCE.md).

    ``int8_input``: compile the (q, scale) int8-waveform entry
    (``--transfer int8`` — half the int16 path's host->device bytes;
    infer/streaming.py::quantize_clips_int8)."""
    if ref_exact:
        fold = False
    train_model = AudioDetectionModel.from_config(
        cfg, num_classes=num_classes, branch_act=ref_exact, dtype=dtype
    )
    variables = load_model_variables(train_model, model_path)
    if fold:
        variables = fold_repvgg(variables)
        model = AudioDetectionModel.from_config(
            cfg, num_classes=num_classes, deploy=True, dtype=dtype
        )
    else:
        model = train_model
    if int8_calib is not None:
        if not fold:
            raise ValueError("--int8 requires the folded model (drop --no_fold/--ref_exact)")
        from audioyolo_tpu.models.quant import calibrate_quant

        variables = {
            **variables,
            "quant": calibrate_quant(model, variables, [int8_calib]),
        }
    keep_k = int(cfg.raw.get("tpu_config", {}).get("nms_keep", 128))
    # packed output: one device->host buffer per chunk (see infer/decode.py)
    return make_inference_fn(
        model, variables, iou_threshold, conf_threshold, keep_k, packed=True,
        int8_input=int8_input,
    )


def load_calib_batch(paths, cfg, frame_fn=None, n_clips: int = 4):
    """Read the first ``n_clips`` sample-duration windows from ``paths``
    (zero-padded tails) as a float32 model-input batch for int8 calibration.

    Files are downmixed to mono and rate-converted to ``cfg.sample_rate``
    (linear interpolation — calibration only needs absmax-accurate
    amplitudes, not audiophile resampling), matching the windows the
    inference path actually feeds the model for such files."""
    import numpy as np

    from audioyolo_tpu.data.wavio import read_wav, read_wav_info

    size = int(cfg.clip_samples)
    rate = int(cfg.sample_rate)
    clips = []
    for p in paths:
        og_rate = read_wav_info(p)[0]
        need_src = int(np.ceil(size * n_clips * og_rate / rate))
        audio, _ = read_wav(p, num_frames=need_src)
        if audio.shape[0] != 1:  # (C, S) -> mono downmix like streaming.py
            audio = audio.mean(axis=0, keepdims=True)
        mono = audio[0].astype(np.float32)
        if og_rate != rate:
            n_out = int(mono.size * rate / og_rate)
            mono = np.interp(
                np.arange(n_out) * (og_rate / rate),
                np.arange(mono.size), mono,
            ).astype(np.float32)
        n = min(n_clips - len(clips), max(1, int(np.ceil(mono.size / size))))
        buf = np.zeros((n, size), np.float32)
        flat = mono[: n * size]
        buf.reshape(-1)[: flat.size] = flat
        clips.extend(buf)
        if len(clips) >= n_clips:
            break
    if not clips:
        raise ValueError("no calibration audio found")
    batch = np.stack(clips)[:, None, :]
    return frame_fn(batch[:, 0, :]) if frame_fn is not None else batch


def build_frame_fn(cfg):
    """Host framer for the fused frontend path (None when ineligible).

    Only worth enabling (``--framed_input``) when host->device bandwidth is
    plentiful: framed input trades ~29% more transfer bytes for ~10 ms less
    device work per 32-clip batch. Streaming inference is usually
    transfer-bound, so the default ships minimum-byte int16 waveforms
    (docs/PERFORMANCE.md).

    With ``tpu_config.frontend_precision: int8`` the framer is the
    per-clip-quantizing :meth:`frame_host_int8` — the model's DFT GEMM runs
    int8 on the MXU at 2x the bf16 rate and the framed transfer drops to
    1/4 the f32 bytes (gate-passed detection equivalence;
    docs/PERFORMANCE.md round 4)."""
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    fe = SpectralFrontend(cfg)
    if fe.fused is None:
        return None
    return fe.frame_host_int8 if fe.fused_int8 else fe.frame_host


def build_worker(config, model_path, class_map_path, iou_threshold,
                 conf_threshold, fold=True, bf16=False, ref_exact=False,
                 framed_input=False, int8_calib_path=None, transfer="int16"):
    """Worker-side factory for the streaming pool (``infer/pool.py``):
    rebuilds the model from its checkpoint inside the worker process and
    returns ``(infer_fn, frame_fn)``."""
    cfg = load_config(config)
    idx2class = get_label_map(class_map_path)
    frame_fn = build_frame_fn(cfg) if framed_input else None
    if transfer == "int8" and frame_fn is not None:
        # framed-int8: the framer must quantize (frame_host_int8) so clips
        # ship as (q, scale) tuples into the model's int8-DFT entry
        from audioyolo_tpu.ops.frontend import SpectralFrontend

        if not SpectralFrontend(cfg).fused_int8:
            raise ValueError(
                "--transfer int8 with --framed_input requires "
                "tpu_config.frontend_precision: int8 (quantizing framer)"
            )
    calib = (
        load_calib_batch([int8_calib_path], cfg, frame_fn=frame_fn)
        if int8_calib_path else None
    )
    infer_fn = build_inference(
        cfg, len(idx2class), model_path, iou_threshold, conf_threshold,
        fold=fold, dtype=jnp.bfloat16 if bf16 else None, ref_exact=ref_exact,
        int8_calib=calib,
        # framed-int8 tuples route through the model's own framed entry; the
        # (q, scale) WAVEFORM entry is only for the unframed int8 path
        int8_input=(transfer == "int8" and frame_fn is None),
    )
    return infer_fn, frame_fn


def main():
    parser = argparse.ArgumentParser(description="Audio model inference")
    parser.add_argument("--config", type=str, default="config/config.yaml", metavar="")
    parser.add_argument("--class_map_path", type=str, default="", metavar="")
    parser.add_argument("--model_path", type=str, default="", metavar="")
    parser.add_argument("--batch_size", type=int, default=0, metavar="",
                        help="windows per device batch (0 -> config batch_size)")
    parser.add_argument("--audio_filepath", type=str, default="", metavar="")
    parser.add_argument("--audio_dir", type=str,
                        default=os.path.join("dataset", "openbmat", "eval"), metavar="")
    parser.add_argument("--extension", type=str, default="wav", metavar="")
    parser.add_argument("--output_dir", type=str, default="model_predictions", metavar="")
    parser.add_argument("--num_concurrency", type=int, default=10, metavar="")
    parser.add_argument("--workers", type=int, default=1, metavar="",
                        help="streaming worker processes (infer/pool.py): the "
                             "host->device pipe's throughput cap is per-"
                             "process, so N workers ingest ~N x faster; a "
                             "single file is sharded by chunk ranges, a "
                             "directory by files")
    parser.add_argument("--iou_threshold", type=float, default=0.1, metavar="")
    parser.add_argument("--conf_threshold", type=float, default=0.2, metavar="")
    parser.add_argument("--no_fold", action="store_true",
                        help="run the unfused multi-branch RepVGG form")
    parser.add_argument("--ref_exact", action="store_true",
                        help="reference-exact forward for imported .pth "
                             "checkpoints (per-branch RepVGG activation, no fold)")
    parser.add_argument("--bf16", action="store_true",
                        help="bfloat16 compute for the detector body")
    parser.add_argument("--int8", action="store_true",
                        help="int8 detector body on the MXU (scales "
                             "calibrated on the first windows of the input; "
                             "stem + prediction heads stay float — "
                             "models/quant.py)")
    parser.add_argument("--framed_input", action="store_true",
                        help="host-frame clips for the fused frontend (more "
                             "transfer bytes, less device work — only wins on "
                             "fast host->device links)")
    parser.add_argument("--transfer", type=str, default="int16",
                        choices=("int16", "int8"),
                        help="host->device waveform transfer format: int16 "
                             "(exact for PCM16 sources) or int8 (half the "
                             "bytes; per-clip scales, dequantized in-graph — "
                             "for transfer-bound streaming; detection-"
                             "equivalent on the demo model, "
                             "docs/PERFORMANCE.md). Requires native-rate "
                             "files. With --framed_input, clips ship as "
                             "framed-int8 (q, scale) tuples into the int8-"
                             "DFT entry (needs frontend_precision: int8; "
                             "more bytes than the int8 waveform but zero "
                             "device resample/frame work)")
    args = parser.parse_args()

    cfg = load_config(args.config)
    tc = cfg.raw["train_config"]
    class_map_path = args.class_map_path or os.path.join(tc["class_map_path"], "class_map.json")
    model_path = args.model_path or os.path.join(tc["model_path"], "AudioDetectionModel.msgpack")
    batch_size = args.batch_size or int(tc["batch_size"])

    if not os.path.isfile(class_map_path):
        raise FileNotFoundError(f"{class_map_path} does not exist")
    idx2class = get_label_map(class_map_path)

    def _first_input_path():
        if args.audio_filepath:
            return args.audio_filepath
        ext = args.extension.replace(".", "")
        names = sorted(
            f for f in os.listdir(args.audio_dir) if f.endswith(f".{ext}")
        )
        if not names:
            raise OSError(f"no .{ext} files in {args.audio_dir}")
        return os.path.join(args.audio_dir, names[0])

    if args.workers > 1:
        from audioyolo_tpu.infer.pool import StreamWorkerPool

        factory_kwargs = dict(
            config=args.config, model_path=model_path,
            class_map_path=class_map_path, iou_threshold=args.iou_threshold,
            conf_threshold=args.conf_threshold, fold=not args.no_fold,
            bf16=args.bf16, ref_exact=args.ref_exact,
            framed_input=args.framed_input,
            int8_calib_path=_first_input_path() if args.int8 else None,
            transfer=args.transfer,
        )
        eval_kwargs = dict(
            input_sample_rate=cfg.sample_rate,
            sample_duration=cfg.sample_duration,
            batch_size=batch_size,
            idx2class_map=idx2class,
            transfer=args.transfer,
        )
        with StreamWorkerPool("inference:build_worker", factory_kwargs,
                              args.workers, eval_kwargs) as pool:
            if args.audio_filepath:
                if not os.path.isfile(args.audio_filepath):
                    raise FileNotFoundError(f"{args.audio_filepath} not found")
                pool.evaluate_file(args.audio_filepath, args.output_dir)
            else:
                if not os.path.isdir(args.audio_dir):
                    raise OSError(f"directory {args.audio_dir} not found")
                ext = args.extension.replace(".", "")
                paths = sorted(
                    os.path.join(args.audio_dir, f)
                    for f in os.listdir(args.audio_dir)
                    if f.endswith(f".{ext}")
                )
                pool.evaluate_dir(paths, args.output_dir)
        return

    # same construction/validation path as the pool workers use
    infer_fn, frame_fn = build_worker(
        args.config, model_path, class_map_path, args.iou_threshold,
        args.conf_threshold, fold=not args.no_fold, bf16=args.bf16,
        ref_exact=args.ref_exact, framed_input=args.framed_input,
        int8_calib_path=_first_input_path() if args.int8 else None,
        transfer=args.transfer,
    )
    kwargs = dict(
        input_sample_rate=cfg.sample_rate,
        sample_duration=cfg.sample_duration,
        batch_size=batch_size,
        idx2class_map=idx2class,
        frame_fn=frame_fn,
        transfer=args.transfer,
    )
    if args.audio_filepath:
        if not os.path.isfile(args.audio_filepath):
            raise FileNotFoundError(f"{args.audio_filepath} not found")
        os.makedirs(args.output_dir, exist_ok=True)
        evaluate_audio(infer_fn, args.audio_filepath, args.output_dir, **kwargs)
    else:
        if not os.path.isdir(args.audio_dir):
            raise OSError(f"directory {args.audio_dir} not found")
        evaluate_dir(
            infer_fn, args.audio_dir, args.output_dir,
            extension=args.extension.replace(".", ""),
            num_concurrency=args.num_concurrency,
            **kwargs,
        )


if __name__ == "__main__":
    main()
