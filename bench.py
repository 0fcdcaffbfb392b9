"""Headline benchmark: batched offline inference throughput per TPU chip.

Measures audio-seconds processed per wall-second for the flagship model
(BASELINE.json config #2: RepVGG branches folded to single convs, bfloat16
detector body, full in-graph frontend + decode + NMS), steady-state on
device-resident input (the streaming pipeline overlaps host IO with device
compute, so compute throughput is the governing rate).

Prints ONE JSON line:
``{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}``
``vs_baseline`` is the ratio against the 50x-audio-realtime-per-chip
north-star target (BASELINE.md; the reference publishes no throughput numbers).
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_AUDIO_SECONDS_PER_SEC = 50.0  # 50x realtime target per chip
NUM_CLASSES = 2
BATCH = 32
WARMUP = 3
ITERS = 10


def main():
    from audioyolo_tpu.config import load_config
    from audioyolo_tpu.infer import make_inference_fn
    from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg

    cfg = load_config("config/config.yaml")
    rng = jax.random.PRNGKey(0)

    train_model = AudioDetectionModel.from_config(cfg, num_classes=NUM_CLASSES)
    sample = jnp.zeros((1, 1, cfg.clip_samples), jnp.float32)
    variables = train_model.init({"params": rng, "dropout": rng}, sample, train=False)
    variables = fold_repvgg(variables)

    deploy = AudioDetectionModel.from_config(
        cfg, num_classes=NUM_CLASSES, deploy=True, dtype=jnp.bfloat16
    )
    infer_fn = make_inference_fn(
        deploy, variables, iou_threshold=0.1, conf_threshold=0.2,
        keep_k=int(cfg.raw.get("tpu_config", {}).get("nms_keep", 128)),
    )

    audio = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 1, cfg.clip_samples)).astype(np.float32)
        * 0.1
    )
    audio = jax.device_put(audio)

    for _ in range(WARMUP):
        out = infer_fn(audio)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = infer_fn(audio)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    audio_seconds = BATCH * float(cfg.sample_duration) * ITERS
    value = audio_seconds / elapsed
    print(
        json.dumps(
            {
                "metric": "audio_seconds_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "audio-s/s",
                "vs_baseline": round(value / BASELINE_AUDIO_SECONDS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
