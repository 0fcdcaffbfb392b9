"""Measure the device cost of the frame-boundary relayout that a factorized
(two-stage resample + Cooley-Tukey DFT) frontend would require.

Round-4 verdict item 2 proposes factoring the folded resample+window+DFT
matrix (ops/fused_frontend.py) into a banded-conv resample followed by an
8x125 two-stage DFT to cut frontend FLOPs. The arithmetic (measured
constants, docs/PERFORMANCE.md round 5): folded = 1782 x 1002 = 1.79M
MACs/frame running int8 at 2x MXU rate = 0.89M bf16-equivalent; factorized
= 0.59M (block resample, 459x320 dense per 320-sample block — NOT
factorizable) + 0.27M (8-point inner + 125-contraction outer, complex, bf16)
= 0.86M — break-even on MXU time BEFORE any data movement. The factorized
pipeline additionally needs its resampled output re-blocked from
(B, 3000, 320) polyphase blocks to (B, 960, 1000) frames — a minor-dim
change to a non-lane-multiple (1000), i.e. a physical relayout (the exact
round-1 wall the fused formulation removed). This script measures that one
remaining constant on the real chip.

OUTCOME (round 5): unusable through the tunnelled runtime — at ~1 GB
tensor sizes the per-dispatch overhead (~40-80 ms) swamps device time and
an elementwise-only control measured SLOWER than the relayout. Kept as the
documented attempt; the factorized-DFT decision rests on the MACs
arithmetic + round-1 in-program relayout measurements instead
(docs/PERFORMANCE.md round 5 "factorized DFT frontend").
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/audioyolo_jax_bench_cache"))

B = int(sys.argv[1]) if len(sys.argv) > 1 else 256


def timed(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jax.tree.leaves(out)[0].ravel()[:1])  # fetch-sync
    return (time.perf_counter() - t0) / iters


# the re-blocking a factorized frontend needs: polyphase-block layout
# (B, 3000, 320) -> frame layout (B, 960, 1000); both f32 and bf16
x32 = jax.device_put(jnp.zeros((B, 3000, 320), jnp.float32))
x16 = jax.device_put(jnp.zeros((B, 3000, 320), jnp.bfloat16))
reshape = jax.jit(lambda x: x.reshape(B, 960, 1000) + 0.0)

# control: a minor-dim-preserving merge (free if layouts behave)
merge = jax.jit(lambda x: x.reshape(B, 960000) + 0.0)

print(f"B={B}")
print(f"reshape (B,3000,320)->(B,960,1000) f32 : {timed(reshape, x32)*1e3:8.2f} ms")
print(f"reshape (B,3000,320)->(B,960,1000) bf16: {timed(reshape, x16)*1e3:8.2f} ms")
print(f"merge   (B,3000,320)->(B,960000)   f32 : {timed(merge, x32)*1e3:8.2f} ms")
