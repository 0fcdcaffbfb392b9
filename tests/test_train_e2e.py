"""End-to-end training on synthetic data (SURVEY.md §4 items 3-4):
loss must decrease over a few epochs; data-parallel grads on an 8-device
virtual mesh must match single-device training on the same batch."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.parallel import make_mesh
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

from synth import make_flat_dataset


def _build(tiny_cfg, num_classes, mesh=None, steps_per_epoch=3):
    model = AudioDetectionModel.from_config(tiny_cfg, num_classes=num_classes)
    tc = tiny_cfg.raw["train_config"]
    loss_fn = AudioDetectionLoss(
        anchors_dict=tiny_cfg.raw["anchors"],
        num_classes=num_classes,
        sample_duration=tiny_cfg.sample_duration,
        anchor_t=tc["loss_config"]["anchor_t"],
        edge_t=tc["loss_config"]["edge_t"],
        box_w=tc["loss_config"]["box_w"],
        conf_w=tc["loss_config"]["conf_w"],
        class_w=tc["loss_config"]["class_w"],
        multi_label=tc["loss_config"]["multi_label"],
        label_smoothing=tc["loss_config"]["label_smoothing"],
    )
    tx = make_optimizer(tc["optimizer_config"], tc["lr_scheduler_config"], steps_per_epoch)
    trainer = TrainerPipeline(
        model, loss_fn, tx, model_path="/tmp/ignore_model", metrics_path="/tmp/ignore_metrics",
        mesh=mesh,
    )
    return model, loss_fn, trainer


def test_training_decreases_loss(tmp_path, tiny_cfg):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=6, seed=0)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, batch_size=2, shuffle=True, seed=1)
    _, _, trainer = _build(tiny_cfg, num_classes=len(ds.class2idx))

    state = trainer.create_state(ds[0]["audio"][None])
    losses = []
    for _ in range(4):
        state, metrics = trainer.train(state, loader)
        losses.append(metrics["aggregate_loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_eval_and_checkpoint_roundtrip(tmp_path, tiny_cfg):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=4, seed=2)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, batch_size=2, shuffle=False)
    _, _, trainer = _build(tiny_cfg, num_classes=len(ds.class2idx))
    trainer.saved_model_path = str(tmp_path / "ckpt.msgpack")

    state = trainer.create_state(ds[0]["audio"][None])
    state, _ = trainer.train(state, loader)
    m1 = trainer.evaluate(state, loader)
    trainer.save_model(state)

    state2 = trainer.create_state(ds[0]["audio"][None])
    state2 = trainer.load_model(state2)
    m2 = trainer.evaluate(state2, loader)
    assert m1["aggregate_loss"] == pytest.approx(m2["aggregate_loss"], rel=1e-5)

    trainer.metrics_to_csv()
    trainer.save_metrics_plots(figsize=(8, 20))
    import os

    assert os.path.exists(os.path.join(trainer.metrics_path, "train_metrics.csv"))


def test_data_parallel_matches_single_device(tmp_path, tiny_cfg):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=8, seed=4)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    nc = len(ds.class2idx)

    batch = AudioDataset.collate([ds[i] for i in range(8)])

    _, _, t_single = _build(tiny_cfg, nc)
    _, _, t_dp = _build(tiny_cfg, nc, mesh=make_mesh(8))

    s0 = t_single.create_state(ds[0]["audio"][None])
    s1 = t_dp.create_state(ds[0]["audio"][None])

    class OneBatch:
        def __iter__(self):
            return iter([batch])

    s0, m0 = t_single.train(s0, OneBatch())
    s1, m1 = t_dp.train(s1, OneBatch())

    assert m0["aggregate_loss"] == pytest.approx(m1["aggregate_loss"], rel=2e-4)
    flat0 = jax.tree_util.tree_leaves(s0.params)
    flat1 = jax.tree_util.tree_leaves(s1.params)
    for a, b in zip(flat0, flat1):
        diff = np.abs(np.asarray(a) - np.asarray(b)).ravel()
        # Reduction-order noise can flip the sign of a near-zero gradient, and
        # Adam's first-step update is +-lr regardless of magnitude — so allow
        # a vanishing fraction of ~lr-sized outliers, but the bulk must match.
        assert (diff > 1e-4).mean() < 1e-5, diff.max()
        assert diff.max() < 3e-3  # bounded by ~2*lr


def test_ema_training(tmp_path, tiny_cfg):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=4, seed=6)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, batch_size=2, shuffle=False)

    model = AudioDetectionModel.from_config(tiny_cfg, num_classes=len(ds.class2idx))
    tc = tiny_cfg.raw["train_config"]
    loss_fn = AudioDetectionLoss(tiny_cfg.raw["anchors"], len(ds.class2idx),
                                 sample_duration=4, multi_label=True)
    tx = make_optimizer(tc["optimizer_config"], None, 1)
    trainer = TrainerPipeline(model, loss_fn, tx, use_ema=True,
                              ema_config=tc["ema_config"], metrics_path="/tmp/ignore")
    state = trainer.create_state(ds[0]["audio"][None])
    state, _ = trainer.train(state, loader)
    assert int(state.ema.num_updates) == len(loader)
    # early in training m ~= 1 so EMA tracks live params closely
    d = jax.tree_util.tree_map(lambda a, b: float(jnp.abs(a - b).max()), state.ema.params, state.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-2
    _ = trainer.evaluate(state, loader)
