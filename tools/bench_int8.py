"""A/B the int8 PTQ body against the bf16 bench posture, end-to-end.

Runs the exact headline configuration from bench.py (folded deploy model,
bf16 body, bf16 frontend GEMMs, framed input, B=256, 4 batches/dispatch)
with and without the calibrated int8 'quant' collection, on the real TPU.
Adopt int8 into the bench posture only if THIS number improves — isolated
segment timings mislead (docs/PERFORMANCE.md, round-2/3 lessons).

Usage: python tools/bench_int8.py [batch] [n_dispatch] [--scaled]
(--scaled A/Bs the Bottleneck [3,4,6,3] scaled-backbone bench config.)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def main() -> None:
    argv = [a for a in sys.argv[1:] if a != "--scaled"]
    scaled = "--scaled" in sys.argv[1:]
    batch = int(argv[0]) if len(argv) > 0 else 256
    n_dispatch = int(argv[1]) if len(argv) > 1 else 4

    from audioyolo_tpu.config import Config, load_config
    from audioyolo_tpu.infer.decode import make_multi_inference_fn
    from audioyolo_tpu.models import AudioDetectionModel
    from audioyolo_tpu.models.quant import calibrate_quant, quantized_paths
    from audioyolo_tpu.ops.frontend import SpectralFrontend

    raw = load_config("config/config.yaml").to_dict()
    raw.setdefault("tpu_config", {})["frontend_precision"] = "default"
    if scaled:
        raw["resnet_config"] = {"block": "Bottleneck"}
        raw["block_layers"] = [3, 4, 6, 3]
    cfg = Config(raw)
    num_classes = 2

    model = AudioDetectionModel.from_config(
        cfg, num_classes=num_classes, deploy=True, dtype=jnp.bfloat16
    )
    train_model = AudioDetectionModel.from_config(cfg, num_classes=num_classes)
    x0 = np.zeros((1, 1, int(cfg.clip_samples)), np.float32)
    variables = jax.jit(lambda r, a: train_model.init(r, a, train=False))(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)}, x0
    )
    from audioyolo_tpu.models import fold_repvgg

    variables = fold_repvgg(jax.tree.map(np.asarray, variables))

    fe = SpectralFrontend(cfg)
    rng = np.random.default_rng(0)

    def make_batches(seed0):
        outs = []
        for i in range(n_dispatch):
            a = (rng.standard_normal((batch, 1, int(cfg.clip_samples)))
                 .astype(np.float32) * 0.1)
            outs.append(fe.frame_host(a[:, 0, :]) if fe.fused is not None else a)
        return [jax.device_put(b) for b in outs]

    batches = make_batches(0)

    calib = np.asarray(batches[0][:8])
    qcol = calibrate_quant(model, variables, [calib])
    print(f"{len(quantized_paths(qcol))} convs int8", flush=True)

    def bench(vs, label):
        fn = make_multi_inference_fn(model, vs, n_batches=n_dispatch,
                                     keep_k=int(cfg.raw["tpu_config"].get("nms_keep", 128)))
        out = fn(batches)
        jax.block_until_ready(out)
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(batches)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / (iters * n_dispatch)
        thr = batch * float(cfg.sample_duration) / dt
        print(f"{label}: {dt*1e3:.2f} ms/batch  {thr:,.0f} audio-s/s", flush=True)
        return thr

    bf16 = bench(variables, "bf16 body      ")
    int8 = bench({**variables, "quant": qcol}, "int8 body      ")
    print(f"int8/bf16 speedup: {int8/bf16:.3f}x", flush=True)


if __name__ == "__main__":
    main()
