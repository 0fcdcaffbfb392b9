"""Per-op trace of the headline inference dispatch (B=256, int8-DFT
frontend, bf16 body, folded RepVGG, packed decode+NMS) on the real chip.
Feeds the round-4 verdict item 7 (decode-tail fraction at the new
baseline). Usage: python tools/profile_infer.py [batch] [n_dispatch]"""
import json, os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
import jax

from audioyolo_tpu.config import load_config
from audioyolo_tpu.utils.profiling import profile_trace, summarize_trace
import bench

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
ND = int(sys.argv[2]) if len(sys.argv) > 2 else 1

cfg = load_config("config/config.yaml")
infer_fn, frame_fn, fe = bench._build_infer(cfg, packed=True, n_dispatch=ND)
rng = np.random.default_rng(3)
audio = (rng.standard_normal((B, cfg.clip_samples)) * 0.1).astype(np.float32)
x = jax.device_put(frame_fn(audio)) if frame_fn is not None else jax.device_put(audio[:, None, :])
args = [x] * ND if ND > 1 else x

# fetch-differenced steady-state (bench._steady_state): plain wall loops
# through the tunnelled runtime mis-time by >100x at these sizes
# (docs/PERFORMANCE.md round-5 methodology note)
dt = bench._steady_state(infer_fn, args) / ND
print(f"wall {dt*1e3:.2f} ms/batch ({B*float(cfg.sample_duration)/dt:,.0f} audio-s/s)", flush=True)
out = infer_fn(args)
jax.block_until_ready(out)

with profile_trace("/tmp/infer_trace"):
    for _ in range(5):
        out = infer_fn(args)
    jax.block_until_ready(out)
print(json.dumps(summarize_trace("/tmp/infer_trace", top=40), indent=1))
