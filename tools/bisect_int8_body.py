"""Per-layer TPU-vs-CPU activation bisect for the int8 PTQ body.

Round-4 demoted the int8 detector body: on the strong demo checkpoint the
TPU gate failed (event mAP 0.180 vs 0.953 float) while the SAME
checkpoint+scales pass on the CPU backend (0.955), single int8 convs are
bit-exact on TPU in isolation, and whole-graph noise is ~3x CPU's
(docs/PERFORMANCE.md round 4). This tool pinpoints where the divergence
enters: it runs the quantized deploy graph once per backend with
``capture_intermediates=True`` and prints, for every module output in
depth order, the relative TPU-int8 vs CPU-int8 difference alongside the
int8-vs-float difference on each backend — the first layer where the
cross-backend column jumps above the within-backend quantization noise is
the culprit.

Usage:
    python tools/bisect_int8_body.py \
        --model_path /tmp/demo_run_r5/saved_model/AudioDetectionModel.msgpack \
        --dataset_path /tmp/demo_ds [--config config/config.yaml]

Requires both backends visible (the tunnelled TPU plus host CPU); forces
``jax_platforms=axon,cpu`` the same way bench.py does.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS", "") == "axon":
    jax.config.update("jax_platforms", "axon,cpu")
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/audioyolo_jax_bench_cache"))

import jax.numpy as jnp
import numpy as np


def flatten_paths(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_paths(v, prefix + (k,)))
        return out
    if isinstance(tree, (tuple, list)):
        for i, v in enumerate(tree):
            out.update(flatten_paths(v, prefix + (str(i),)))
        return out
    out[prefix] = tree
    return out


def depth_key(path):
    """Heuristic depth ordering for the ResNet/neck module tree."""
    p = "/".join(path)
    order = 0.0
    if "frontend" in p:
        order = 0
    elif "feature_extractor" in p:
        order = 10
        for tok in p.split("/"):
            if tok.startswith("layer") and "_" in tok:
                try:
                    a, b = tok.replace("layer", "").split("_")
                    order = 20 + 10 * int(a) + int(b)
                except ValueError:
                    pass
            elif tok in ("conv1", "conv2", "bn1"):
                order = 11
    elif "multiscale_module" in p:
        order = 100
    return (order, p)


def run_backend(model, variables, x, device):
    @jax.jit
    def fwd(v, a):
        return model.apply(v, a, train=False, combine_scales=True,
                           capture_intermediates=True, mutable=["intermediates"])

    with jax.default_device(device):
        out, inter = fwd(jax.device_put(variables, device),
                         jax.device_put(x, device))
    from audioyolo_tpu.train.trainer import TrainerPipeline

    host = TrainerPipeline.fetch_tree(
        {"out": out, "inter": inter["intermediates"]})
    return np.asarray(host["out"]), flatten_paths(host["inter"])


def rel(a, b):
    d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64))
    s = np.abs(np.asarray(b, np.float64)).max() + 1e-12
    return float(d.max() / s)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/config.yaml")
    ap.add_argument("--model_path", required=True)
    ap.add_argument("--dataset_path", required=True)
    ap.add_argument("--num_classes", type=int, default=2)
    args = ap.parse_args()

    from audioyolo_tpu.config import load_config
    from audioyolo_tpu.data.wavio import read_wav
    from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg
    from audioyolo_tpu.models.quant import calibrate_quant
    from flax import serialization

    cfg = load_config(args.config)
    model = AudioDetectionModel.from_config(cfg, num_classes=args.num_classes,
                                            deploy=True)

    with open(args.model_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    variables = fold_repvgg({"params": payload["params"],
                             "batch_stats": payload["batch_stats"]})

    eval_dir = os.path.join(args.dataset_path, "eval")
    wavs = sorted(p for p in os.listdir(eval_dir) if p.endswith(".wav"))[:2]
    clips = []
    for w in wavs:
        a, _ = read_wav(os.path.join(eval_dir, w))
        a = a[:1, : cfg.clip_samples]
        if a.shape[-1] < cfg.clip_samples:
            a = np.pad(a, ((0, 0), (0, cfg.clip_samples - a.shape[-1])))
        clips.append(a)
    x = np.stack(clips)  # (B, 1, S)

    cpu = jax.devices("cpu")[0]
    accel = None
    for d in jax.devices():
        if d.platform != "cpu":
            accel = d
            break
    if accel is None:
        raise SystemExit("no accelerator visible — run on the TPU host")

    # calibrate once on CPU (deterministic, backend-independent scales)
    with jax.default_device(cpu):
        quant = calibrate_quant(model, variables, [jnp.asarray(x)])
    qvars = {**variables, "quant": quant}

    print("running float on both backends...", flush=True)
    f_cpu, if_cpu = run_backend(model, variables, x, cpu)
    f_tpu, if_tpu = run_backend(model, variables, x, accel)
    print("running int8 on both backends...", flush=True)
    q_cpu, iq_cpu = run_backend(model, qvars, x, cpu)
    q_tpu, iq_tpu = run_backend(model, qvars, x, accel)

    print(f"\nfinal combined preds: float tpu-vs-cpu rel {rel(f_tpu, f_cpu):.2e}"
          f" | int8 tpu-vs-cpu rel {rel(q_tpu, q_cpu):.2e}"
          f" | int8-vs-float (cpu) {rel(q_cpu, f_cpu):.2e}"
          f" | int8-vs-float (tpu) {rel(q_tpu, f_tpu):.2e}\n")

    rows = []
    for path in sorted(iq_cpu.keys(), key=depth_key):
        if path not in iq_tpu or path not in if_cpu:
            continue
        rows.append({
            "layer": "/".join(p for p in path if p != "__call__"),
            "i8_xbackend": rel(iq_tpu[path], iq_cpu[path]),
            "f32_xbackend": rel(if_tpu[path], if_cpu[path]),
            "i8_vs_f32_cpu": rel(iq_cpu[path], if_cpu[path]),
            "i8_vs_f32_tpu": rel(iq_tpu[path], if_tpu[path]),
        })
    w = max(len(r["layer"]) for r in rows)
    print(f"{'layer':<{w}}  i8 tpu-vs-cpu  f32 tpu-vs-cpu  i8-vs-f32(cpu)  i8-vs-f32(tpu)")
    for r in rows:
        print(f"{r['layer']:<{w}}  {r['i8_xbackend']:>13.2e}  {r['f32_xbackend']:>14.2e}"
              f"  {r['i8_vs_f32_cpu']:>14.2e}  {r['i8_vs_f32_tpu']:>14.2e}")
    with open("/tmp/bisect_int8.json", "w") as f:
        json.dump(rows, f, indent=1)
    print("\nrows -> /tmp/bisect_int8.json")


if __name__ == "__main__":
    main()
