"""True multi-process data parallelism (SURVEY.md §2.3 / multi-host DP):
two OS processes, each with 2 virtual CPU devices and a disjoint
BatchLoader shard, coordinate through ``jax.distributed`` and run sharded
train steps over the global 4-device mesh. The run covers:

- epoch metrics matching a single-process run on the equivalently-ordered
  global batch (exercises ``jax.make_array_from_process_local_data`` in
  ``TrainerPipeline._put_batch`` — a plain ``device_put`` against the
  global mesh would silently drop each host's rows);
- a cross-process checkpoint into a SHARED model dir (the
  ``jax.process_index() == 0`` guard in ``_atomic_write``: one writer, no
  temp-file races) followed by a resume on BOTH processes and a second
  epoch whose metrics must also match the single-process reference.
"""

import copy
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from audioyolo_tpu.config import Config
from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

from synth import make_flat_dataset

# compile-heavy / multi-process: excluded from the fast tier (-m 'not slow')
pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_dp_matches_single_process(tmp_path, tiny_cfg):
    root = str(tmp_path / "ds")
    ann = make_flat_dataset(root, n_files=8, seed=31)
    with open(os.path.join(root, "ann.json"), "w") as f:
        json.dump(ann, f)

    out_json = str(tmp_path / "metrics.json")
    shared_model_dir = str(tmp_path / "shared_model")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}

    def run_workers():
        port = _free_port()
        workers = [
            subprocess.Popen(
                [sys.executable, os.path.join(os.path.dirname(__file__), "mp_worker.py"),
                 str(pid), "2", str(port), root, out_json, shared_model_dir],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            )
            for pid in range(2)
        ]
        outs = []
        for w in workers:
            try:
                out, _ = w.communicate(timeout=1200)
            except subprocess.TimeoutExpired:
                for ww in workers:
                    ww.kill()
                    ww.communicate()
                return ["<timeout>"] * 2, [-1] * 2
            outs.append(out)
        return outs, [w.returncode for w in workers]

    # distributed coordination on a loaded 1-core host is timing-sensitive
    # (the workers AOT-warm their compiles and meet at a 15-min barrier
    # before the first collective, but still allow one retry)
    outs, rcs = run_workers()
    if any(rc != 0 for rc in rcs):
        outs, rcs = run_workers()
    for pid, (rc, out) in enumerate(zip(rcs, outs)):
        assert rc == 0, f"worker {pid} failed:\n{out[-3000:]}"
    mp0 = json.load(open(f"{out_json}.0"))
    mp1 = json.load(open(f"{out_json}.1"))

    # both processes must report identical epoch metrics (replicated state)
    for ep in ("epoch1", "epoch2"):
        for k, v in mp0[ep].items():
            assert mp1[ep][k] == pytest.approx(v, rel=1e-6, abs=1e-8), (ep, k)

    # exactly one checkpoint, no temp residue, in the shared dir
    assert os.path.exists(os.path.join(shared_model_dir, "checkpoint.msgpack"))
    assert not [p for p in os.listdir(shared_model_dir) if ".tmp" in p]

    # single-process reference on the same global batch: shard (i, 2) of the
    # unshuffled epoch gives host0 items [0,2,4,6], host1 [1,3,5,7]; mesh
    # device order is [p0d0, p0d1, p1d0, p1d1], so the assembled global batch
    # is host0's rows then host1's
    cfg = Config(copy.deepcopy(tiny_cfg.to_dict()))
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    order = list(range(0, 8, 2)) + list(range(1, 8, 2))
    batch = AudioDataset.collate([ds[i] for i in order])

    tc = cfg.raw["train_config"]
    model = AudioDetectionModel.from_config(cfg, num_classes=len(ds.class2idx))
    loss_fn = AudioDetectionLoss(
        cfg.raw["anchors"], len(ds.class2idx), sample_duration=cfg.sample_duration,
        multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3, anchor_t=5,
    )
    tx = make_optimizer(tc["optimizer_config"], tc["lr_scheduler_config"], 1)
    ref_dir = str(tmp_path / "ref_model")
    trainer = TrainerPipeline(model, loss_fn, tx, metrics_path=ref_dir,
                              model_path=ref_dir)
    state = trainer.create_state(ds[0]["audio"][None])

    class One:
        def __iter__(self):
            return iter([batch])

    # mirror the workers: epoch 1 -> checkpoint -> resume -> epoch 2
    state, ref1 = trainer.train(state, One())
    trainer.save_checkpoint(state, epoch=0, best_loss=ref1["aggregate_loss"])
    state, next_epoch, _ = trainer.load_checkpoint(state)
    assert next_epoch == 1
    _, ref2 = trainer.train(state, One())
    for mp_m, ref in ((mp0["epoch1"], ref1), (mp0["epoch2"], ref2)):
        for k in ("aggregate_loss", "mean_ciou", "conf_loss", "class_loss"):
            assert mp_m[k] == pytest.approx(ref[k], rel=2e-3, abs=1e-4), k
        # f1 is a thresholded count: ~1e-4 logit noise between the two
        # compilations flips borderline cells, so it gets an absolute
        # tolerance (a real gradient-sync bug shows O(1) divergence here)
        assert mp_m["f1"] == pytest.approx(ref["f1"], abs=2e-2), "f1"
