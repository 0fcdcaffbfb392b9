"""Multi-process data-parallel worker (driven by test_multiprocess_dp.py).

Each process owns 2 virtual CPU devices and a disjoint BatchLoader shard;
together they run sharded train steps over the global mesh — the real
multi-host path (jax.distributed + make_array_from_process_local_data), not
the single-process virtual-mesh approximation the other DP tests use. The
run covers a full epoch, a cross-process checkpoint (coordinator-only write
to a SHARED model_path), a resume from that checkpoint on every process, and
a second epoch on the restored state.

Flakiness control (1-core host): the gloo rendezvous inside the first
sharded step has a hard ~30 s key-value timeout, so if one worker is still
cold-compiling when the other starts executing, the run dies. We therefore
AOT-compile the train step (local, no collectives) with the persistent
compile cache enabled, then meet at a coordination-service barrier with a
15-minute budget before the first collective executes.

Usage: python mp_worker.py <pid> <nprocs> <port> <dataset_root> <out_json>
       <shared_model_dir>
"""

import json
import os
import sys

pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
root, out_path, model_dir = sys.argv[4], sys.argv[5], sys.argv[6]

os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "audioyolo_jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.distributed.initialize(
    f"localhost:{port}", num_processes=nprocs, process_id=pid,
    initialization_timeout=600,
)
_client = jax._src.distributed.global_state.client

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
    metrics_path=os.path.join(model_dir, "metrics"), model_path=model_dir,
)

# create_state's replicated device_put of a host numpy pytree runs jax's
# cross-process assert_equal — a process_allgather, i.e. THE first gloo
# collective of the run, with gloo's hard ~30 s pairwise context-init
# window. It executes long before the explicit pre-step barrier below, so
# it must get its own barrier (and retry: a context-init timeout fails both
# sides, which then meet again at the next barrier).
for _attempt in range(4):
    _client.wait_at_barrier(f"ayt_state_{_attempt}", timeout_in_ms=900_000)
    try:
        state = trainer.create_state(ds[0]["audio"][None])
        break
    except Exception:
        if _attempt == 3:
            raise

# AOT-compile the sharded step before any collective executes (compilation is
# per-process local; only execution rendezvouses through gloo), then barrier
# so both workers enter the first step within milliseconds of each other.
trainer._build_steps()
peek = trainer._put_batch(next(iter(loader)))
trainer._train_step.lower(state, *peek).compile()
_client.wait_at_barrier("ayt_compiled", timeout_in_ms=900_000)

# Establish the gloo communicator clique NOW, microseconds after the
# barrier, with a trivial cross-host psum — gloo context init has a hard
# ~30 s pairwise rendezvous window, and the real first step sits behind
# tens of seconds of asymmetric host work (wav reads, collate) on a loaded
# 1-core machine. Once the context exists, later collectives reuse it.
# Context init is idempotent, so a timeout (the other process descheduled)
# is simply retried at a fresh barrier.
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import jax.numpy as jnp  # noqa: E402

_repl = NamedSharding(mesh, P())
_ga = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("data")), np.ones((2,), np.float32)
)
_warm = jax.jit(lambda a: a.sum(), out_shardings=_repl)
for _attempt in range(4):
    # barrier immediately before every attempt so both sides enter the
    # rendezvous together; a pairwise init timeout fails both sides, so
    # both loop around to the next barrier (divergence would park one
    # process at a barrier until its 15-min budget expires, which the
    # test-level process retry then handles)
    _client.wait_at_barrier(f"ayt_gloo_{_attempt}", timeout_in_ms=900_000)
    try:
        assert float(_warm(_ga)) == 2.0 * nprocs
        break
    except Exception:
        if _attempt == 3:
            raise

state, m1 = trainer.train(state, loader)

# cross-process checkpoint to the SHARED model dir: the process-0 guard in
# _atomic_write means exactly one writer; fetch_tree is collective-free
trainer.save_checkpoint(state, epoch=0, best_loss=m1["aggregate_loss"])
ckpt = trainer.resume_checkpoint_path
if pid != 0:
    assert not os.path.exists(ckpt + f".tmp.{os.getpid()}"), "non-coordinator wrote"
_client.wait_at_barrier("ayt_ckpt_saved", timeout_in_ms=900_000)
assert os.path.exists(ckpt), "coordinator checkpoint missing"
stray = [p for p in os.listdir(model_dir) if ".tmp" in p]
assert not stray, f"torn/racy temp files: {stray}"

state, next_epoch, best = trainer.load_checkpoint(state)
assert next_epoch == 1
state, m2 = trainer.train(state, loader)

with open(f"{out_path}.{pid}", "w") as f:
    json.dump({"epoch1": m1, "epoch2": m2, "best": best}, f)
print(f"worker {pid}: OK loss={m2['aggregate_loss']:.6f}", flush=True)
