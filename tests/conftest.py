"""Test harness: run everything on a virtual 8-device CPU mesh.

Must set the env before jax is imported anywhere: tests exercise the same
sharded code paths that run on a real TPU pod slice, using XLA's host-platform
fake devices (SURVEY.md §4 item 4).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

# The environment's sitecustomize may import jax (registering a TPU backend)
# before this conftest runs, in which case the env var above is read too late —
# force the platform through the live config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: the model-level tests compile several large
# CPU executables (~1 min each on this single-core host); caching makes every
# rerun of the suite start-to-finish fast.
_cache_dir = os.path.join(os.path.expanduser("~"), ".cache", "audioyolo_jax_test_cache")
os.makedirs(_cache_dir, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


TINY_CFG = {
    # 4-second clips at 8 kHz, no resampling: 32000 samples -> 160 frames,
    # grids 20/10/5, 105 proposals. Heights still 32 so the ResNet stem
    # reduces 32 -> 8 -> pyramid heights 8/4/2/1 as in the full config.
    "anchors": {
        "sm": [0.2, 0.5, 0.9],
        "md": [1.2, 1.6, 2.0],
        "lg": [2.5, 3.0, 3.8],
    },
    "num_anchors": 3,
    "train_anchors": True,
    "backbone": "resnet",
    "block_layers": [1, 1, 1, 1],
    "resnet_config": {"block": "BasicBlock"},
    "dropout": 0.0,
    "melspectrogram_config": {
        "n_fft": 200,
        "win_length": None,
        "hop_length": 200,
        "center": False,
        "pad_mode": "reflect",
        "power": 2,
        "n_mels": 32,
        "mel_scale": "htk",
        "norm": "slaney",
    },
    "mfcc_config": {
        "n_mfcc": 32,
        "melkwargs": {
            "n_fft": 200,
            "win_length": None,
            "hop_length": 200,
            "center": False,
            "pad_mode": "reflect",
            "power": 2,
            "n_mels": 32,
            "mel_scale": "htk",
            "norm": "slaney",
        },
    },
    "sample_duration": 4,
    "sample_rate": 8000,
    "new_sample_rate": 8000,
    "scale_input": True,
    "taper_input": False,
    "taper_window": "hann",
    "audio_extension": "wav",
    "train_config": {
        "dataset_path": "dataset/*",
        "class_map_path": "idx2class_mapping",
        "annotator": "annotator_a",
        "batch_size": 2,
        "device": "cpu",
        "epochs": 2,
        "loss_config": {
            "anchor_t": 5,
            "edge_t": 0.5,
            "box_w": 0.1,
            "conf_w": 1.0,
            "class_w": 0.3,
            "multi_label": True,
            "label_smoothing": 0.08,
            "alpha": None,
            "gamma": None,
            "batch_scale_loss": False,
        },
        "optimizer_config": {
            "name": "Adam",
            "lr": 0.001,
            "betas": [0.9, 0.999],
            "eps": 1.0e-8,
            "weight_decay": 0.002,
        },
        "lr_scheduler_config": {
            "name": "CosineAnnealingWarmRestarts",
            "T_0": 200,
            "T_mult": 1,
            "eta_min": 1.0e-6,
        },
        "use_ema": False,
        "ema_config": {"momentum": 0.002, "num_updates": 0, "N": 2000},
        "use_lr_scheduler": True,
        "shuffle_samples": True,
        "verbose": False,
        "metrics_path": "metrics",
        "model_path": "saved_model",
    },
    "tpu_config": {
        "max_targets": 8,
        "nms_keep": 32,
        "compute_dtype": "float32",
        "mesh_axis": "data",
    },
}


@pytest.fixture()
def tiny_cfg():
    import copy

    from audioyolo_tpu.config import Config

    return Config(copy.deepcopy(TINY_CFG))


@pytest.fixture()
def rng():
    return np.random.default_rng(1234)
