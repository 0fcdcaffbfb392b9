"""Training entry point (CLI surface of reference ``train.py``).

Usage: ``python train.py [--config config/config.yaml]``

Resolves datasets from ``train_config.dataset_path`` (single directory,
``;``-separated list, or glob ``*`` — reference ``train.py:101-132``), builds
the jitted TPU training pipeline, runs the epoch loop with best-eval-loss
checkpointing, and exports metric CSVs/plots.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
from datetime import datetime

import numpy as np

from audioyolo_tpu.config import load_config
from audioyolo_tpu.data import AudioConcatDataset, AudioDataset, BatchLoader
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.parallel import make_mesh
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer
from audioyolo_tpu.utils import seed_everything, setup_logging

SEED = 42


def load_annotations(data_path: str, annotator: str):
    path = os.path.join(data_path, "annotations", "annotation.json")
    with open(path, "r") as f:
        data = json.load(f)
    return data["annotations"][annotator]


def make_dataset(path, annotations, cfg, max_targets):
    kwargs = dict(
        sample_duration=cfg.sample_duration,
        sample_rate=cfg.sample_rate,
        extension=cfg.raw["audio_extension"],
        max_targets=max_targets,
    )
    if isinstance(path, str):
        return AudioDataset(path, annotations, **kwargs)
    return AudioConcatDataset.make_combo_dataset(path, annotations, **kwargs)


def resolve_datasets(cfg, max_targets):
    tc = cfg.raw["train_config"]
    data_path = tc["dataset_path"]
    annotator = tc["annotator"]
    split_paths = data_path.split(";")

    if (not data_path.endswith("*")) and len(split_paths) == 1:
        ann = load_annotations(data_path, annotator)
        train_ds = make_dataset(os.path.join(data_path, "train"), ann, cfg, max_targets)
        eval_ds = make_dataset(os.path.join(data_path, "eval"), ann, cfg, max_targets)
        return train_ds, eval_ds

    paths = split_paths if len(split_paths) > 1 else sorted(glob.glob(data_path))
    if not paths:
        raise OSError(f"no datasets found at {data_path}")
    anns, train_dirs, eval_dirs = [], [], []
    for p in paths:
        if not os.path.exists(p):
            raise OSError(f"path {p} not found")
        anns.append(load_annotations(p, annotator))
        train_dirs.append(os.path.join(p, "train"))
        eval_dirs.append(os.path.join(p, "eval"))
    return (
        make_dataset(train_dirs, anns, cfg, max_targets),
        make_dataset(eval_dirs, anns, cfg, max_targets),
    )


def run(cfg, data_parallel: bool = False, resume: bool = False):
    tc = cfg.raw["train_config"]
    tpu_cfg = cfg.raw.get("tpu_config", {})
    max_targets = int(tpu_cfg.get("max_targets", 48))

    train_ds, eval_ds = resolve_datasets(cfg, max_targets)
    import jax

    if jax.process_index() == 0:  # one writer on a shared filesystem
        AudioDataset.save_label_map(train_ds.class2idx, tc["class_map_path"])
    num_classes = len(train_ds.class2idx)

    batch_size = int(tc["batch_size"])
    last_batch = "pad" if data_parallel else "partial"
    transfer_dtype = tpu_cfg.get("transfer_dtype", "float32")
    # fused frontend: frame on the loader's prefetch thread so the device
    # frontend is pure GEMMs (no relayout reshapes); see ops/fused_frontend.py
    frame_fn, framer = None, None
    if bool(tpu_cfg.get("framed_input", True)):
        from audioyolo_tpu.ops.frontend import SpectralFrontend

        _fe = SpectralFrontend(cfg)
        if _fe.fused is not None and _fe.fused_int8:
            # frontend_precision 'int8': ship per-clip-quantized int8 frames
            # — the DFT GEMM runs int8 on the MXU at 2x the bf16 rate
            # (docs/PERFORMANCE.md round 4; detection gate-passed, training
            # convergence gate in docs/RESULTS.md). The native int16 framed
            # decode (framer) doesn't produce tuples, so it stays off here.
            frame_fn = _fe.frame_host_int8
        elif _fe.fused is not None:
            frame_fn, framer = _fe.frame_host, _fe.fused
    # multi-host DP: each host loads a disjoint 1/process_count slice of the
    # globally-shuffled epoch (equal lengths — lockstep collectives)
    shard = None
    if data_parallel and jax.process_count() > 1:
        shard = (jax.process_index(), jax.process_count())
    train_loader = BatchLoader(
        train_ds, batch_size, shuffle=bool(tc.get("shuffle_samples", True)),
        seed=SEED, last_batch=last_batch, transfer_dtype=transfer_dtype,
        frame_fn=frame_fn, framer=framer, shard=shard,
    )
    eval_loader = BatchLoader(
        eval_ds, batch_size, shuffle=False, last_batch=last_batch,
        transfer_dtype=transfer_dtype, frame_fn=frame_fn, framer=framer,
        shard=shard,
    )
    # small-corpus device cache: ship every clip once, gather shuffled
    # batches on device — per-epoch h2d traffic drops from the dataset to
    # the target arrays. Decisive when the tunnelled pipe degrades
    # (docs/PERFORMANCE.md round 4). "auto" caches when the dataset fits
    # device_cache_max_mb; multi-host sharded loaders are never cached.
    from audioyolo_tpu.data.loader import DeviceCachedLoader

    train_loader = DeviceCachedLoader.wrap_from_config(train_loader, tpu_cfg)
    eval_loader = DeviceCachedLoader.wrap_from_config(eval_loader, tpu_cfg)
    for name, ld in (("train", train_loader), ("eval", eval_loader)):
        if isinstance(ld, DeviceCachedLoader):
            print(f"[device-cache] {name} dataset resident on device "
                  f"({ld.nbytes / 1e6:.0f} MB)")

    dtype = None
    if tpu_cfg.get("compute_dtype") in ("bfloat16", "bf16"):
        import jax.numpy as jnp

        dtype = jnp.bfloat16
    model = AudioDetectionModel.from_config(cfg, num_classes=num_classes, dtype=dtype)

    lc = tc["loss_config"]
    loss_fn = AudioDetectionLoss(
        anchors_dict=cfg.raw["anchors"],
        num_classes=num_classes,
        sample_duration=cfg.sample_duration,
        class_weights=train_ds.get_class_weights(),
        anchor_t=lc.get("anchor_t", 4.0),
        edge_t=lc.get("edge_t", 0.5),
        box_w=lc.get("box_w", 1.0),
        conf_w=lc.get("conf_w", 1.0),
        class_w=lc.get("class_w", 1.0),
        multi_label=lc.get("multi_label", False),
        label_smoothing=lc.get("label_smoothing", 0.0),
        batch_scale_loss=lc.get("batch_scale_loss", False),
        alpha=lc.get("alpha"),
        gamma=lc.get("gamma"),
    )
    tx = make_optimizer(
        tc["optimizer_config"],
        tc.get("lr_scheduler_config"),
        steps_per_epoch=len(train_loader),
        use_lr_scheduler=bool(tc.get("use_lr_scheduler", True)),
    )
    # metric-driven LR (torch ReduceLROnPlateau semantics): host-side
    # controller fed the epoch eval loss; rewrites the injected LR leaf in
    # the optimizer state between epochs — no recompilation
    plateau = None
    sched_cfg = tc.get("lr_scheduler_config") or {}
    if (bool(tc.get("use_lr_scheduler", True))
            and sched_cfg.get("name") == "ReduceLROnPlateau"):
        from audioyolo_tpu.train import ReduceLROnPlateau

        plateau = ReduceLROnPlateau.from_config(
            sched_cfg, float(tc["optimizer_config"].get("lr", 1e-3))
        )

    mesh = make_mesh() if data_parallel else None
    trainer = TrainerPipeline(
        model, loss_fn, tx,
        model_path=tc["model_path"],
        metrics_path=tc["metrics_path"],
        ema_config=tc.get("ema_config"),
        use_ema=bool(tc.get("use_ema", False)),
        mesh=mesh,
        seed=SEED,
        # fuse S optimizer steps into one compiled dispatch (host dispatch
        # through a remote runtime costs ~3 ms/call; semantics tested equal)
        steps_per_dispatch=int(tpu_cfg.get("steps_per_dispatch", 1)),
        # selective remat: keep only conv outputs as backward residuals
        # (numerically exact; big HBM win on the memory-bound TPU step)
        remat=bool(tpu_cfg.get("train_remat", False)),
        # "rbg": hardware-RNG dropout masks (~10% step win at dropout 0.4 on
        # TPU; different-but-deterministic stream — see train/trainer.py)
        prng_impl=tpu_cfg.get("train_prng") or None,
    )
    sample = train_ds[0]["audio"][None]
    if frame_fn is not None:
        sample = frame_fn(sample[:, 0, :])
    state = trainer.create_state(sample)

    verbose = bool(tc.get("verbose", True))
    best_loss = np.inf
    start_epoch = 0
    if resume and os.path.exists(trainer.resume_checkpoint_path):
        state, start_epoch, best_loss = trainer.load_checkpoint(state)
        if plateau is not None and (trainer.checkpoint_extra or {}).get("plateau"):
            plateau.load_state_dict(trainer.checkpoint_extra["plateau"])
        print(
            f"[{datetime.now():%Y-%m-%d %H:%M:%S}] Resumed from epoch {start_epoch} "
            f"(best eval loss {best_loss:.4f})"
        )
    # full resume checkpoints are ~2x model size; write them every N epochs
    # (the best-model artifact is still saved on every eval-loss improvement)
    ckpt_every = max(int(tpu_cfg.get("checkpoint_every", 1)), 1)
    last_epoch = int(tc["epochs"]) - 1
    for epoch in range(start_epoch, int(tc["epochs"])):
        print(f"\n[{datetime.now():%Y-%m-%d %H:%M:%S}]: Epoch {epoch}")
        state, _ = trainer.train(state, train_loader, verbose=verbose)
        eval_metrics = trainer.evaluate(state, eval_loader, verbose=verbose)
        eval_loss = eval_metrics["aggregate_loss"]
        if eval_loss < best_loss:
            trainer.save_model(state)
            best_loss = eval_loss
            print(
                f"[{datetime.now():%Y-%m-%d %H:%M:%S}] Model saved at epoch: "
                f"{epoch + 1} loss: {best_loss}"
            )
        if plateau is not None:
            state = trainer.set_learning_rate(state, plateau.step(eval_loss))
        if epoch % ckpt_every == 0 or epoch == last_epoch:
            extra = {"plateau": plateau.state_dict()} if plateau is not None else None
            trainer.save_checkpoint(state, epoch, best_loss, extra=extra)
    trainer.metrics_to_csv()
    trainer.save_metrics_plots(figsize=(25, 10))


if __name__ == "__main__":
    setup_logging()
    seed_everything(SEED)  # host RNG (loader shuffle); device RNG is keyed
    parser = argparse.ArgumentParser(description="Audio activity detection training")
    parser.add_argument("--config", type=str, default="config/config.yaml")
    parser.add_argument(
        "--data_parallel", action="store_true",
        help="shard batches over all visible devices (ICI data parallelism)",
    )
    parser.add_argument(
        "--resume", action="store_true",
        help="resume from <model_path>/checkpoint.msgpack if present",
    )
    args = parser.parse_args()
    run(load_config(args.config), data_parallel=args.data_parallel, resume=args.resume)
