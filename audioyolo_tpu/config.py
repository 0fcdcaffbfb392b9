"""Config system.

Loads the same YAML schema as the reference (``config/config.yaml:1-99`` in
``/root/reference``) so that reference configs are drop-in reusable, and exposes
it as a light attribute-access wrapper plus helpers for derived static shapes
(grid sizes, frame counts) that the XLA graphs key off.

Everything downstream treats a config as *static* trace-time metadata: none of
its values ever become traced arrays.
"""

from __future__ import annotations

import copy
import math
import os
from typing import Any, Dict, List, Union

import yaml

DEFAULT_CONFIG_PATH = os.path.join("config", "config.yaml")


def _require(d: Dict[str, Any], key: str, ctx: str) -> Any:
    if key not in d:
        raise KeyError(f"config missing required key '{key}' in {ctx}")
    return d[key]


class Config:
    """Attribute/dict hybrid view over the parsed YAML tree.

    ``cfg["melspectrogram_config"]`` and ``cfg.melspectrogram_config`` are both
    supported; nested dicts are wrapped lazily. The raw dict is available as
    ``cfg.raw`` (useful for writing back, e.g. anchor fitting).
    """

    def __init__(self, raw: Dict[str, Any]):
        object.__setattr__(self, "raw", raw)

    def __getitem__(self, key: str) -> Any:
        val = self.raw[key]
        return Config(val) if isinstance(val, dict) else val

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __contains__(self, key: str) -> bool:
        return key in self.raw

    def get(self, key: str, default: Any = None) -> Any:
        if key in self.raw:
            return self[key]
        return default

    def keys(self):
        return self.raw.keys()

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(self.raw)

    # ---- derived static quantities -------------------------------------

    @property
    def num_anchors(self) -> int:
        return int(self.raw["num_anchors"])

    @property
    def sample_duration(self) -> float:
        return float(self.raw["sample_duration"])

    @property
    def sample_rate(self) -> int:
        return int(self.raw["sample_rate"])

    @property
    def new_sample_rate(self) -> int:
        return int(self.raw["new_sample_rate"])

    @property
    def clip_samples(self) -> int:
        """Samples per training clip at the dataset sample rate (22050*60)."""
        return int(round(self.sample_duration * self.sample_rate))

    @property
    def model_samples(self) -> int:
        """Samples per clip after the front-end resample (16000*60)."""
        return int(
            math.ceil(self.new_sample_rate * self.clip_samples / self.sample_rate)
        )

    @property
    def n_frames(self) -> int:
        """Spectrogram time frames for one clip (960 with the shipped config)."""
        mel = self.raw["melspectrogram_config"]
        n_fft = int(mel["n_fft"])
        hop = int(mel.get("hop_length") or n_fft)
        win = int(mel.get("win_length") or n_fft)
        del win
        if mel.get("center", True):
            return 1 + self.model_samples // hop
        return 1 + (self.model_samples - n_fft) // hop

    @property
    def n_mels(self) -> int:
        return int(self.raw["melspectrogram_config"]["n_mels"])

    @property
    def grid_sizes(self) -> List[int]:
        """Temporal grid cells per detection scale: (T/8, T/16, T/32)."""
        t = self.n_frames
        return [t // 8, t // 16, t // 32]

    @property
    def total_proposals(self) -> int:
        """Anchor boxes per clip across all scales (630 with shipped config)."""
        return sum(self.grid_sizes) * self.num_anchors

    def anchors_array(self):
        import numpy as np

        a = self.raw["anchors"]
        return {
            "sm": np.asarray(a["sm"], dtype=np.float32),
            "md": np.asarray(a["md"], dtype=np.float32),
            "lg": np.asarray(a["lg"], dtype=np.float32),
        }


def load_config(path: Union[str, Dict[str, Any], Config, None] = None) -> Config:
    """Load a YAML config (reference-schema) into a :class:`Config`.

    Accepts a path, an already-parsed dict, an existing Config (pass-through),
    or None (uses ``config/config.yaml`` relative to cwd).
    """
    if isinstance(path, Config):
        return path
    if isinstance(path, dict):
        return Config(copy.deepcopy(path))
    path = path or DEFAULT_CONFIG_PATH
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    if not isinstance(raw, dict):
        raise ValueError(f"config at {path} did not parse to a mapping")
    _require(raw, "anchors", path)
    _require(raw, "melspectrogram_config", path)
    _require(raw, "train_config", path)
    return Config(raw)


def save_config(cfg: Union[Config, Dict[str, Any]], path: str) -> None:
    raw = cfg.raw if isinstance(cfg, Config) else cfg
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)


def set_config_anchors(
    path: str,
    sm: List[float],
    md: List[float],
    lg: List[float],
) -> None:
    """Write fitted anchors back into a YAML config (anchor-fit tool hook,
    mirroring the behavior of reference ``compute_anchors.py:21-30``)."""
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    raw["anchors"]["sm"] = [float(x) for x in sm]
    raw["anchors"]["md"] = [float(x) for x in md]
    raw["anchors"]["lg"] = [float(x) for x in lg]
    with open(path, "w") as f:
        yaml.safe_dump(raw, f)
