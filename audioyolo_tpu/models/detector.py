"""Top-level detection model (reference ``modules/_architecture.py:10-189``).

``AudioDetectionModel`` wires frontend -> backbone -> neck -> per-scale decode
as a pure function of ``(variables, waveform)``. The per-cell prediction layout
along the last axis is ``[objectness, class_0..C-1, center_sec, width_sec]``;
three scales with temporal grids T/8, T/16, T/32 and ``num_anchors`` anchor
slots per cell (630 proposals per 60 s clip in the shipped config).

Anchors are stored as parameters normalized by ``sample_duration``
(reference ``:39-52``) and optionally trainable (``train_anchors``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config import Config, load_config
from ..ops.frontend import SpectralFrontend
from .backbone import CustomBackbone, ResNetBackbone
from .neck import MultiScaleFmapModule

Dtype = Any


def decode_scale(
    raw: jax.Array,
    anchors_sec: jax.Array,
    num_classes: int,
    spectral_size: int,
    sample_duration: float,
) -> jax.Array:
    """Per-scale decode (reference ``get_scale_pred``, ``_architecture.py:132-156``).

    ``raw``: (B, G, A*(3+C)) neck output. Returns (B, G, A, 3+C) with centers
    and widths decoded to seconds and clipped to ``[0, sample_duration]``.
    """
    b, g, _ = raw.shape
    a = anchors_sec.shape[0]
    p = raw.reshape(b, g, a, 3 + num_classes).astype(jnp.float32)

    objectness = p[..., :1]
    class_logits = p[..., 1 : 1 + num_classes]

    stride = spectral_size // g
    center_scaler = spectral_size / sample_duration  # spectral frames per second
    grid = jnp.arange(g, dtype=jnp.float32)[None, :, None, None]
    centers = (jax.nn.sigmoid(p[..., -2:-1]) * 2.0 - 0.5) + grid
    centers = centers * stride / center_scaler
    widths = (jax.nn.sigmoid(p[..., -1:]) * 2.0) ** 2 * anchors_sec[None, None, :, None]

    centers = jnp.clip(centers, 0.0, sample_duration)
    widths = jnp.clip(widths, 0.0, sample_duration)
    return jnp.concatenate([objectness, class_logits, centers, widths], axis=-1)


class AudioDetectionModel(nn.Module):
    num_classes: int
    config: Dict[str, Any]  # raw reference-schema config dict (static metadata)
    deploy: bool = False  # True -> RepVGG blocks are single folded convs
    # True -> reference-exact per-branch LeakyReLU inside RepVGG blocks (the
    # form genuine reference checkpoints were trained and evaluated in); see
    # layers.RepVGGBlock. Incompatible with fold_repvgg numerics.
    branch_act: bool = False
    dtype: Optional[Dtype] = None  # compute dtype for backbone+neck (e.g. bf16)

    @classmethod
    def from_config(
        cls,
        config: Union[str, Dict[str, Any], Config, None],
        num_classes: int,
        deploy: bool = False,
        branch_act: bool = False,
        dtype: Optional[Dtype] = None,
    ) -> "AudioDetectionModel":
        cfg = load_config(config)
        return cls(num_classes=num_classes, config=cfg.to_dict(), deploy=deploy,
                   branch_act=branch_act, dtype=dtype)

    @property
    def cfg(self) -> Config:
        return Config(self.config)

    @property
    def out_channels(self) -> int:
        return int(self.config["num_anchors"]) * (3 + self.num_classes)

    def setup(self):
        cfg = self.cfg
        self.frontend = SpectralFrontend(cfg)
        dur = cfg.sample_duration
        anchors = cfg.anchors_array()
        self._train_anchors = bool(self.config.get("train_anchors", True))
        for key in ("sm", "md", "lg"):
            norm = (anchors[key] / dur).astype(np.float32)
            self.__setattr__(
                f"{key}_anchors",
                self.param(f"{key}_anchors", lambda rng, v=norm: jnp.asarray(v)),
            )

        backbone = self.config.get("backbone", "resnet")
        if backbone == "resnet":
            rc = dict(self.config.get("resnet_config") or {})
            block = rc.get("block", "BasicBlock")
            if not isinstance(block, str):
                block = getattr(block, "__name__", str(block))
            tpu_cfg = self.config.get("tpu_config") or {}
            self.feature_extractor = ResNetBackbone(
                block=block,
                block_layers=tuple(self.config["block_layers"]),
                dropout=float(self.config.get("dropout", 0.0)),
                dtype=self.dtype,
                s2d_stem=str(tpu_cfg.get("s2d_stem", "on")).lower(),
            )
        elif backbone == "custom":
            self.feature_extractor = CustomBackbone(
                block_layers=tuple(self.config["block_layers"]),
                dropout=float(self.config.get("dropout", 0.0)),
                dtype=self.dtype,
            )
        else:
            raise ValueError(f"unknown backbone type: {backbone}")

        self.multiscale_module = MultiScaleFmapModule(
            out_channels=self.out_channels, deploy=self.deploy,
            branch_act=self.branch_act, dtype=self.dtype,
        )

    def _anchors_sec(self, key: str) -> jax.Array:
        a = getattr(self, f"{key}_anchors") * self.cfg.sample_duration
        if not self._train_anchors:
            a = jax.lax.stop_gradient(a)
        return a

    def __call__(
        self,
        audio: Optional[jax.Array] = None,
        train: bool = False,
        combine_scales: bool = False,
        features: Optional[jax.Array] = None,
    ):
        """``audio``: (B, S) or (B, 1, S) waveform at the dataset sample rate;
        alternatively pass precomputed ``features`` (B, n_mels, T, 2)."""
        cfg = self.cfg
        if features is None:
            if audio is None:
                raise ValueError("provide either audio or features")
            with jax.named_scope("frontend"):
                features = self.frontend(audio)
        x = features.astype(self.dtype) if self.dtype is not None else features

        with jax.named_scope("backbone"):
            fmaps = self.feature_extractor(x, train=train)
        with jax.named_scope("neck"):
            n2, n3, n4 = self.multiscale_module(*fmaps, train=train)

        spectral = cfg.n_frames
        dur = cfg.sample_duration
        with jax.named_scope("decode"):
            sm = decode_scale(n2, self._anchors_sec("sm"), self.num_classes, spectral, dur)
            md = decode_scale(n3, self._anchors_sec("md"), self.num_classes, spectral, dur)
            lg = decode_scale(n4, self._anchors_sec("lg"), self.num_classes, spectral, dur)

        if not combine_scales:
            return sm, md, lg
        b = sm.shape[0]
        flat = [p.reshape(b, -1, 3 + self.num_classes) for p in (sm, md, lg)]
        return jnp.concatenate(flat, axis=1)
