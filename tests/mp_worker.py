"""Multi-process data-parallel worker (driven by test_multiprocess_dp.py).

Each process owns 2 virtual CPU devices and a disjoint BatchLoader shard;
together they run ONE sharded train step over the global mesh — the real
multi-host path (jax.distributed + make_array_from_process_local_data), not
the single-process virtual-mesh approximation the other DP tests use.

Usage: python mp_worker.py <pid> <nprocs> <port> <dataset_root> <out_json>
"""

import json
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
root, out_path = sys.argv[4], sys.argv[5]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(f"localhost:{port}", num_processes=nprocs, process_id=pid)

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from conftest import TINY_CFG  # noqa: E402
from audioyolo_tpu.config import Config  # noqa: E402
from audioyolo_tpu.data.dataset import AudioDataset  # noqa: E402
from audioyolo_tpu.data.loader import BatchLoader  # noqa: E402
from audioyolo_tpu.models import AudioDetectionModel  # noqa: E402
from audioyolo_tpu.parallel import make_mesh  # noqa: E402
from audioyolo_tpu.train import (  # noqa: E402
    AudioDetectionLoss,
    TrainerPipeline,
    make_optimizer,
)

import copy  # noqa: E402

cfg = Config(copy.deepcopy(TINY_CFG))
ann = json.load(open(os.path.join(root, "ann.json")))
ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
nc = len(ds.class2idx)

# each host loads its disjoint half of the (unshuffled) epoch: 8 items ->
# 4 per host -> global batch 8 over the 4-device global mesh
loader = BatchLoader(ds, 4, shuffle=False, shard=(pid, nprocs))

tc = cfg.raw["train_config"]
model = AudioDetectionModel.from_config(cfg, num_classes=nc)
loss_fn = AudioDetectionLoss(
    cfg.raw["anchors"], nc, sample_duration=cfg.sample_duration,
    multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3, anchor_t=5,
)
tx = make_optimizer(tc["optimizer_config"], tc["lr_scheduler_config"], 1)
mesh = make_mesh()  # all 4 global devices
assert mesh.devices.size == 2 * nprocs
trainer = TrainerPipeline(
    model, loss_fn, tx, mesh=mesh,
    metrics_path=f"/tmp/mp_metrics_{pid}", model_path=f"/tmp/mp_model_{pid}",
)

state = trainer.create_state(ds[0]["audio"][None])
state, metrics = trainer.train(state, loader)

if pid == 0:
    with open(out_path, "w") as f:
        json.dump(metrics, f)
print(f"worker {pid}: OK loss={metrics['aggregate_loss']:.6f}", flush=True)
