"""Profile the jitted train step on the real TPU: per-op trace summary.

Run directly on the TPU backend (no platform forcing): builds the bench
train posture (bf16 body + bf16 frontend GEMMs, fused-frontend framed
input), times the steady-state step, then captures a jax.profiler trace and
prints the top ops. Feeds VERDICT round-3 item 3 (train >250k audio-s/s).
Usage: python tools/profile_train.py [batch]
"""
import json, time, sys
import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(__import__("os").path.abspath(__file__))))
from audioyolo_tpu.config import Config, load_config
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer
from audioyolo_tpu.ops.frontend import SpectralFrontend
from audioyolo_tpu.utils.profiling import profile_trace, summarize_trace

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 32
FRONTEND = sys.argv[2] if len(sys.argv) > 2 else "default"
NUM_CLASSES = 2

cfg = load_config("config/config.yaml")
raw = cfg.to_dict()
raw.setdefault("tpu_config", {})["frontend_precision"] = FRONTEND
cfg = Config(raw)
model = AudioDetectionModel.from_config(cfg, num_classes=NUM_CLASSES, dtype=jnp.bfloat16)
tc = cfg.raw["train_config"]
loss_fn = AudioDetectionLoss(
    cfg.raw["anchors"], NUM_CLASSES, sample_duration=cfg.sample_duration,
    multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3, anchor_t=5,
)
tx = make_optimizer(tc["optimizer_config"], tc["lr_scheduler_config"], 100)
trainer = TrainerPipeline(model, loss_fn, tx, use_ema=True,
                          ema_config=tc["ema_config"],
                          metrics_path="/tmp/bench_m", model_path="/tmp/bench_m")
rng = np.random.default_rng(3)
n = 16
fe = SpectralFrontend(cfg)
audio = (rng.standard_normal((BATCH, 1, cfg.clip_samples)) * 0.1).astype(np.float32)
if fe.fused is not None and fe.fused_int8:
    audio = fe.frame_host_int8(audio[:, 0, :])
elif fe.fused is not None:
    audio = fe.frame_host(audio[:, 0, :])
batch = {
    "audio": audio,
    "classes": rng.integers(0, NUM_CLASSES, (BATCH, n)).astype(np.int32),
    "centers": rng.uniform(1, 59, (BATCH, n)).astype(np.float32),
    "widths": rng.uniform(0.5, 30, (BATCH, n)).astype(np.float32),
    "valid": np.ones((BATCH, n), bool),
}
sample = batch["audio"]
sample = tuple(s[:1] for s in sample) if isinstance(sample, tuple) else sample[:1]
state = trainer.create_state(sample)
trainer._build_steps()
audio_d, targets_d = trainer._put_batch(batch)
t0 = time.perf_counter()
state, m = trainer._train_step(state, audio_d, targets_d)
jax.block_until_ready(m)
print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

# timed loop
iters = 20
t0 = time.perf_counter()
for _ in range(iters):
    state, m = trainer._train_step(state, audio_d, targets_d)
jax.block_until_ready(m)
dt = (time.perf_counter() - t0) / iters
print(f"train step wall: {dt*1e3:.2f} ms/step  ({BATCH*60/dt:,.0f} audio-s/s)", flush=True)

with profile_trace("/tmp/train_trace"):
    for _ in range(5):
        state, m = trainer._train_step(state, audio_d, targets_d)
    jax.block_until_ready(m)

top = summarize_trace("/tmp/train_trace", top=45)
print(json.dumps(top, indent=1))
