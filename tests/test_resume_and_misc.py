"""Resume checkpoints, taper path, batch-scale loss, utils."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.ops.frontend import SpectralFrontend
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

from synth import make_flat_dataset


def _trainer(tiny_cfg, ds, tmp_path, use_ema=False):
    model = AudioDetectionModel.from_config(tiny_cfg, num_classes=len(ds.class2idx))
    tc = tiny_cfg.raw["train_config"]
    loss_fn = AudioDetectionLoss(
        tiny_cfg.raw["anchors"], len(ds.class2idx), sample_duration=4,
        multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3, anchor_t=5,
    )
    tx = make_optimizer(tc["optimizer_config"], tc["lr_scheduler_config"], 3)
    return TrainerPipeline(
        model, loss_fn, tx, model_path=str(tmp_path / "m"),
        metrics_path=str(tmp_path / "met"), use_ema=use_ema,
        ema_config=tc["ema_config"],
    )


def test_resume_checkpoint_roundtrip(tmp_path, tiny_cfg):
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=4, seed=40)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, 2, shuffle=False)

    tr = _trainer(tiny_cfg, ds, tmp_path, use_ema=True)
    state = tr.create_state(ds[0]["audio"][None])
    state, _ = tr.train(state, loader)
    m1 = tr.evaluate(state, loader)
    tr.save_checkpoint(state, epoch=0, best_loss=m1["aggregate_loss"])

    # new trainer + state; resume must restore params, opt state, step, EMA,
    # epoch counter, best loss and metric history
    tr2 = _trainer(tiny_cfg, ds, tmp_path, use_ema=True)
    s2 = tr2.create_state(ds[0]["audio"][None])
    s2, next_epoch, best = tr2.load_checkpoint(s2)
    assert next_epoch == 1
    assert best == pytest.approx(m1["aggregate_loss"], rel=1e-6)
    assert int(s2.step) == int(state.step)
    assert int(s2.ema.num_updates) == int(state.ema.num_updates)
    assert len(tr2._train_metrics) == 1 and len(tr2._eval_metrics) == 1
    m2 = tr2.evaluate(s2, loader)
    assert m2["aggregate_loss"] == pytest.approx(m1["aggregate_loss"], rel=1e-5)

    # atomicity: a leftover .tmp never shadows the real checkpoint
    assert not os.path.exists(tr.resume_checkpoint_path + ".tmp")


def test_taper_window_path(tiny_cfg, rng):
    raw = tiny_cfg.to_dict()
    raw["taper_input"] = True
    from audioyolo_tpu.config import Config

    fe = SpectralFrontend(Config(raw))
    wav = rng.standard_normal((1, 1, tiny_cfg.clip_samples)).astype(np.float32)
    out = np.asarray(fe(jnp.asarray(wav)))
    assert out.shape == (1, 32, tiny_cfg.n_frames, 2)
    assert np.isfinite(out).all()
    # symmetric hann taper: endpoints of the window are ~0, so first/last
    # frames see attenuated signal; just assert it differs from untapered
    fe0 = SpectralFrontend(tiny_cfg)
    out0 = np.asarray(fe0(jnp.asarray(wav)))
    assert np.abs(out - out0).max() > 1e-3


def test_batch_scale_loss_multiplies_by_batch():
    anchors = {"sm": [0.5, 1.0, 1.5], "md": [1.7, 2.0, 2.3], "lg": [2.6, 3.0, 3.5]}
    rng = np.random.default_rng(0)
    b, g, a, c = 4, 10, 3, 2

    def preds(seed):
        r = np.random.default_rng(seed)
        ps = []
        for gg in (20, 10, 5):
            p = r.standard_normal((b, gg, a, 3 + c)).astype(np.float32)
            p[..., -2] = r.uniform(0, 4, (b, gg, a))
            p[..., -1] = r.uniform(0.3, 3.5, (b, gg, a))
            ps.append(jnp.asarray(p))
        return tuple(ps)

    targets = {
        "classes": jnp.asarray(rng.integers(0, c, (b, 4)).astype(np.int32)),
        "centers": jnp.asarray(rng.uniform(0.5, 3.5, (b, 4)).astype(np.float32)),
        "widths": jnp.asarray(rng.uniform(0.3, 2.0, (b, 4)).astype(np.float32)),
        "valid": jnp.ones((b, 4), bool),
    }
    kw = dict(num_classes=c, sample_duration=4.0, multi_label=True)
    l_plain, _ = AudioDetectionLoss(anchors, **kw)(preds(1), targets)
    l_scaled, _ = AudioDetectionLoss(anchors, batch_scale_loss=True, **kw)(preds(1), targets)
    assert float(l_scaled) == pytest.approx(float(l_plain) * b, rel=1e-5)


def test_profiling_utils(tmp_path):
    from audioyolo_tpu.utils import annotate, profile_trace
    from audioyolo_tpu.utils.profiling import summarize_trace

    @jax.jit
    def f(x):
        with annotate("double"):
            return x * 2.0

    x = jnp.ones((128, 128))
    f(x).block_until_ready()
    with profile_trace(str(tmp_path / "prof")):
        f(x).block_until_ready()
    totals = summarize_trace(str(tmp_path / "prof"))
    assert totals  # some device/runtime events captured


def test_seed_and_logging_utils():
    from audioyolo_tpu.utils import seed_everything, setup_logging

    seed_everything(7)
    a = np.random.rand(3)
    seed_everything(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    setup_logging()


def test_int16_transfer_path_bit_exact(tmp_path, tiny_cfg):
    """int16 transfer + in-graph dequantize must match the float path exactly
    for PCM16-derived audio."""
    root = str(tmp_path / "train")
    ann = make_flat_dataset(root, n_files=3, seed=55)
    ds = AudioDataset(root, ann, sample_duration=4, sample_rate=8000, max_targets=8)

    f32 = list(BatchLoader(ds, 2, shuffle=False, prefetch=0))
    i16 = list(BatchLoader(ds, 2, shuffle=False, prefetch=0, transfer_dtype="int16"))
    assert i16[0]["audio"].dtype == np.int16

    fe = SpectralFrontend(tiny_cfg)
    a = np.asarray(fe(jnp.asarray(f32[0]["audio"])))
    b = np.asarray(fe(jnp.asarray(i16[0]["audio"])))
    np.testing.assert_array_equal(a, b)  # bit-exact: source wavs are PCM16


def test_fetch_tree_packed_matches_per_leaf():
    """Packed device->host fetch (one round trip per dtype instead of one per
    leaf — the remote-tunnel checkpoint fix) must reproduce every leaf."""
    tree = {
        "w": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "nest": {"b": jnp.ones((2, 2, 2), jnp.float32), "n": jnp.asarray(7, jnp.int32)},
        "py_int": 3,
        "mixed": [jnp.zeros(5, jnp.int32), 2.5, jnp.asarray(1.5, jnp.float16)],
    }
    got = TrainerPipeline.fetch_tree(tree)
    ref = jax.tree.map(lambda x: np.asarray(x) if isinstance(x, jax.Array) else x, tree)
    for g, r in zip(jax.tree.leaves(got), jax.tree.leaves(ref)):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(r))
        assert not isinstance(g, jax.Array)  # everything landed on host


def test_nonzero_process_index_skips_writes(tmp_path, monkeypatch):
    """Multi-host write hygiene: only the coordinator (process 0) writes
    checkpoints/CSVs/plots — everyone else must return before touching the
    filesystem OR fetching state through the tunnel."""
    monkeypatch.setattr(jax, "process_index", lambda: 1)
    target = str(tmp_path / "ckpt" / "model.msgpack")
    TrainerPipeline._atomic_write(target, {"w": jnp.ones(3)})
    assert not os.path.exists(os.path.dirname(target))

    t = TrainerPipeline(None, None, None, metrics_path=str(tmp_path / "metrics"))
    t._train_metrics = [{"aggregate_loss": 1.0}]
    t.metrics_to_csv()
    t.save_metrics_plots()
    assert not os.path.exists(str(tmp_path / "metrics"))

    monkeypatch.setattr(jax, "process_index", lambda: 0)
    TrainerPipeline._atomic_write(target, {"w": jnp.ones(3)})
    assert os.path.exists(target)
    assert not [p for p in os.listdir(os.path.dirname(target)) if ".tmp" in p]


def test_packer_cache_is_bounded():
    """The jitted packer cache must evict: unbounded growth leaks compiled
    programs in long-lived multi-config processes (advisor round-2 finding)."""
    TrainerPipeline._packer_cache.clear()
    for n in range(1, TrainerPipeline._PACKER_CACHE_MAX + 5):
        TrainerPipeline.fetch_tree({"x": jnp.zeros(n, jnp.float32)})
    assert len(TrainerPipeline._packer_cache) == TrainerPipeline._PACKER_CACHE_MAX


def test_synth_event_clips_representative():
    """Calibration clips (bench int8 PTQ input) must carry real events:
    deterministic, correct shape, and tonal power well above the noise
    floor somewhere in every batch."""
    from audioyolo_tpu.utils.synth_audio import synth_event_clips

    # 60 s clips: events have a 2.5 s minimum width, shorter durations can
    # legitimately come out empty (the bench calibrates with 60 s clips)
    a = synth_event_clips(4, 2000, 60.0, seed=7)
    b = synth_event_clips(4, 2000, 60.0, seed=7)
    assert a.shape == (4, 1, 120000) and a.dtype == np.float32
    assert np.array_equal(a, b)
    # per-clip RMS over 1 s windows: events are ~20 dB above the floor
    w = 2000
    rms = np.sqrt((a[:, 0].reshape(4, -1, w) ** 2).mean(-1))
    assert rms.max() > 10 * rms.min()
