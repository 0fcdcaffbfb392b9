"""End-to-end drive of the evaluate_model.py CLI (event-mAP evaluator):
train briefly, save the model artifact, then run the CLI main() across its
posture flags — default, --framed_input (the int8-DFT framed entry when
frontend_precision is int8), and --int8 (PTQ body). The CLI surface had no
test before round 5; the --framed_input/--int8 composition is the serving
headline posture's accuracy-gate path (docs/PERFORMANCE.md round 5)."""

import copy
import json
import os
import sys

import numpy as np
import pytest
import yaml

from audioyolo_tpu.config import Config
from audioyolo_tpu.data.dataset import AudioDataset
from audioyolo_tpu.data.loader import BatchLoader
from audioyolo_tpu.models import AudioDetectionModel
from audioyolo_tpu.train import AudioDetectionLoss, TrainerPipeline, make_optimizer

from synth import make_flat_dataset, save_reference_layout

# compile-heavy (full CLI builds + several jit programs)
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def cli_setup(tmp_path_factory):
    from conftest import TINY_CFG

    base = tmp_path_factory.mktemp("evalcli")
    ds_root = str(base / "ds")
    ann = make_flat_dataset(os.path.join(ds_root, "eval"), n_files=4, seed=77)
    save_reference_layout(ds_root, ann)

    raw = copy.deepcopy(TINY_CFG)
    raw["tpu_config"]["frontend_precision"] = "int8"
    cfg = Config(raw)

    ds = AudioDataset(os.path.join(ds_root, "eval"), ann, sample_duration=4,
                      sample_rate=8000, max_targets=8)
    loader = BatchLoader(ds, 2, shuffle=True, seed=0)
    model = AudioDetectionModel.from_config(cfg, num_classes=len(ds.class2idx))
    loss_fn = AudioDetectionLoss(
        cfg.raw["anchors"], len(ds.class2idx), sample_duration=4,
        multi_label=True, label_smoothing=0.08, box_w=0.1, class_w=0.3,
        anchor_t=5,
    )
    tx = make_optimizer(cfg.raw["train_config"]["optimizer_config"], None,
                        len(loader))
    trainer = TrainerPipeline(
        model, loss_fn, tx, model_path=str(base / "model"),
        metrics_path=str(base / "metrics"),
    )
    state = trainer.create_state(ds[0]["audio"][None])
    for _ in range(2):
        state, _ = trainer.train(state, loader)
    trainer.save_model(state)

    class_map = str(base / "class_map.json")
    with open(class_map, "w") as f:
        json.dump({str(v): k for k, v in ds.class2idx.items()}, f)
    cfg_path = str(base / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(raw, f)
    return cfg_path, ds_root, class_map, trainer.saved_model_path


def _run_cli(capsys, monkeypatch, cfg_path, ds_root, class_map, model_path,
             *extra):
    import evaluate_model

    monkeypatch.setattr(sys, "argv", [
        "evaluate_model.py", "--config", cfg_path,
        "--dataset_path", ds_root, "--split", "eval",
        "--class_map_path", class_map, "--model_path", model_path,
        "--batch_size", "2", *extra,
    ])
    evaluate_model.main()
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return json.loads(out)


def test_evaluate_model_cli_default(cli_setup, capsys, monkeypatch):
    res = _run_cli(capsys, monkeypatch, *cli_setup)
    assert set(res) >= {"mAP@0.5", "mAP@[.5:.95]", "num_detections",
                        "num_ground_truth", "AP50_per_class"}
    assert res["num_ground_truth"] > 0
    assert np.isfinite(res["mAP@0.5"])


def test_evaluate_model_cli_framed_int8_entry(cli_setup, capsys, monkeypatch):
    """--framed_input with frontend_precision int8 routes through the
    (q, scale) framed entry; the mAP must stay close to the waveform path
    (same checkpoint; int8-DFT noise is ~1e-3 on features)."""
    base = _run_cli(capsys, monkeypatch, *cli_setup)
    framed = _run_cli(capsys, monkeypatch, *cli_setup, "--framed_input")
    assert framed["num_detections"] > 0
    assert abs(framed["mAP@0.5"] - base["mAP@0.5"]) < 0.25

def test_evaluate_model_cli_int8_body_composed(cli_setup, capsys, monkeypatch):
    res = _run_cli(capsys, monkeypatch, *cli_setup, "--int8", "--framed_input")
    assert res["num_detections"] >= 0
    assert np.isfinite(res["mAP@0.5"])
