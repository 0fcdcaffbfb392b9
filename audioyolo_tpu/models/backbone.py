"""Feature-extractor backbones over the (B, 32, 960, 2) spectral image (NHWC).

Two families, mirroring reference ``modules/_backbone.py``:

- :class:`ResNetBackbone` — a torchvision-semantics ResNet (BasicBlock or
  Bottleneck) with the stem swapped for two 7x7/s2 convs over the 2-channel
  spectral input and no maxpool/avgpool/fc (reference ``_backbone.py:119-152``).
  Default config: BasicBlock [2,2,2,2] -> pyramid channels 64/128/256/512 at
  time widths 240/120/60/30, heights 8/4/2/1.
- :class:`CustomBackbone` — residual concat-fusion CNN (``_backbone.py:8-116``):
  each layer runs two (3,7) convs + BN + LeakyReLU(0.2) + dropout alongside a
  strided 1x1 residual conv, channel-concatenated; each block halves the time
  axis once on its last layer.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, Conv2d, leaky_relu

Dtype = Any


class BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None
    expansion = 1

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        identity = x
        out = Conv2d(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv2d(self.planes, 3, 1, 1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != self.planes:
            identity = Conv2d(self.planes, 1, self.stride, 0, use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


class Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Optional[Dtype] = None
    expansion = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        identity = x
        out_ch = self.planes * self.expansion
        out = Conv2d(self.planes, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv1")(x)
        out = BatchNorm(dtype=self.dtype, name="bn1")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv2d(self.planes, 3, self.stride, 1, use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = BatchNorm(dtype=self.dtype, name="bn2")(out, use_running_average=not train)
        out = nn.relu(out)
        out = Conv2d(out_ch, 1, 1, 0, use_bias=False, dtype=self.dtype, name="conv3")(out)
        out = BatchNorm(dtype=self.dtype, name="bn3")(out, use_running_average=not train)
        if self.stride != 1 or x.shape[-1] != out_ch:
            identity = Conv2d(out_ch, 1, self.stride, 0, use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            identity = BatchNorm(dtype=self.dtype, name="downsample_bn")(identity, use_running_average=not train)
        return nn.relu(out + identity)


_BLOCKS = {"BasicBlock": BasicBlock, "Bottleneck": Bottleneck}


class ResNetBackbone(nn.Module):
    block: str = "BasicBlock"
    block_layers: Sequence[int] = (3, 4, 6, 3)
    dropout: float = 0.0
    dtype: Optional[Dtype] = None
    # Space-to-depth stem (exact; layers.s2d_conv2d): the two 7x7/s2 stem convs
    # are channel-starved on the MXU (C_in=2: 17 TF/s measured on v5e) — the
    # 2x2 fold quadruples lane utilization at identical arithmetic. Parameters
    # keep the reference 7x7 layout either way. Modes (tpu_config.s2d_stem):
    # "off" | "on" (conv1 only — the default) | "full" (also folds conv2 —
    # measured NET-NEGATIVE end-to-end both for inference fwd AND for the
    # train step (257.7k -> 234.2k audio-s/s at B=32/S=8): XLA's relayout
    # copies for the folded 64-channel input outweigh the stride-1 grad
    # convs; kept opt-in for other hardware, docs/PERFORMANCE.md round 3).
    # Bools accepted for back-compat.
    s2d_stem: Union[bool, str] = "on"

    @property
    def fmap_channels(self) -> Tuple[int, int, int, int]:
        exp = _BLOCKS[self.block].expansion
        return tuple(p * exp for p in (64, 128, 256, 512))  # type: ignore[return-value]

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> Tuple[jax.Array, ...]:
        blk = _BLOCKS[self.block]
        # conv1 ("on"/"full"): its C_in 2 -> 8 fold is a free bitcast on the
        # incoming {0,3,2,1} layout and runs 2.1x faster (0.171 -> 0.081 ms at
        # B=32). conv2 ("full" only): measured NET-NEGATIVE end-to-end both
        # in inference fwd (~0.19 ms of relayout copies) and in training
        # (257.7k -> 234.2k audio-s/s), even though its stride-2 data-grad
        # is the hottest single train-step op — see class docstring.
        mode = self.s2d_stem
        if isinstance(mode, bool):
            mode = "on" if mode else "off"
        mode = str(mode).lower()
        f1 = (True, True) if mode in ("on", "full") else None
        f2 = (True, True) if mode == "full" else None
        x = Conv2d(64, 7, 2, 3, use_bias=False, dtype=self.dtype, s2d=f1, name="conv1")(x)
        x = Conv2d(64, 7, 2, 3, use_bias=False, dtype=self.dtype, s2d=f2, name="conv2")(x)
        x = BatchNorm(dtype=self.dtype, name="bn1")(x, use_running_average=not train)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)

        fmaps = []
        for li, (planes, stride) in enumerate(zip((64, 128, 256, 512), (1, 2, 2, 2))):
            for bi in range(self.block_layers[li]):
                x = blk(
                    planes,
                    stride=stride if bi == 0 else 1,
                    dtype=self.dtype,
                    name=f"layer{li + 1}_{bi}",
                )(x, train)
            fmaps.append(x)
        return tuple(fmaps)


class ExtractorLayer(nn.Module):
    features: int
    dropout: float = 0.0
    halve_w: bool = False
    halve_h: bool = False
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        if self.features % 2 == 0:
            out = res_out = self.features // 2
        else:
            res_out = self.features // 2
            out = self.features - res_out
        ws = 2 if self.halve_w else 1
        hs = 2 if self.halve_h else 1

        y = Conv2d(32, (3, 7), (1, ws), (1, 3), dtype=self.dtype, name="conv_a")(x)
        y = BatchNorm(dtype=self.dtype, name="bn_a")(y, use_running_average=not train)
        y = leaky_relu(y)
        y = Conv2d(out, (3, 7), (hs, 1), (1, 3), dtype=self.dtype, name="conv_b")(y)
        y = BatchNorm(dtype=self.dtype, name="bn_b")(y, use_running_average=not train)
        y = nn.Dropout(self.dropout, deterministic=not train)(y)

        # The residual 1x1 projection always exists (the reference's
        # `if not (h_stride or w_stride)` guard at _backbone.py:35 is never
        # true because strides are 1 or 2 — we implement the effective path).
        r = Conv2d(res_out, 1, (hs, ws), 0, dtype=self.dtype, name="res_conv")(x)
        return jnp.concatenate([y, r], axis=-1)


class ExtractorBlock(nn.Module):
    features: int
    num_layers: int
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        out_ch = 64
        for i in range(self.num_layers):
            last = i + 1 == self.num_layers
            x = ExtractorLayer(
                self.features if last else out_ch,
                dropout=self.dropout,
                halve_w=last,
                dtype=self.dtype,
                name=f"layer{i}",
            )(x, train)
            out_ch *= 2
        return x


class CustomBackbone(nn.Module):
    block_layers: Sequence[int] = (3, 4, 6, 3)
    dropout: float = 0.0
    dtype: Optional[Dtype] = None

    @property
    def fmap_channels(self) -> Tuple[int, int, int, int]:
        return (128, 256, 512, 1024)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> Tuple[jax.Array, ...]:
        if len(self.block_layers) != 4:
            raise ValueError("block_layers must have length 4")
        x = Conv2d(64, 7, 1, 3, dtype=self.dtype, name="first_conv")(x)
        x = BatchNorm(dtype=self.dtype, name="first_bn")(x, use_running_average=not train)
        x = leaky_relu(x)
        x = ExtractorBlock(64, 2, self.dropout, dtype=self.dtype, name="entry_block")(x, train)
        fmaps = []
        for i, ch in enumerate((128, 256, 512, 1024)):
            x = ExtractorBlock(
                ch, self.block_layers[i], self.dropout, dtype=self.dtype, name=f"block{i + 1}"
            )(x, train)
            fmaps.append(x)
        return tuple(fmaps)
