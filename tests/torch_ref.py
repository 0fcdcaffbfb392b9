"""Test-only torch re-implementation of the reference network (NO torchaudio).

Used exclusively by the parity tests to produce *genuine* ``torch.save``
checkpoints and forward-logit oracles. It reproduces the reference's module
tree and state-dict naming exactly — ``modules/_common.py`` (ConvBorINorm,
RepVGGBlock, RepBlock, BiCModule, CSPSPPFModule, MultiScaleFmapModule),
``modules/_backbone.py`` (ExtractorLayer/Block, CustomBackBone,
ResNetBackBone incl. the torchvision ResNet naming it inherits), and the
decode head of ``modules/_architecture.py:132-156`` — but is written from
scratch against the published behavior: the frontend is omitted (the parity
test feeds precomputed spectral features), so no torchaudio import is needed.
"""

from typing import Iterable, List, Optional, Tuple

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F


def _lrelu() -> nn.Module:
    return nn.LeakyReLU(0.2)


def _pair(k):
    return (k, k) if isinstance(k, int) else tuple(k)


class ConvBorINorm(nn.Module):
    """conv + norm + optional LeakyReLU(0.2), same-padding by default
    (reference modules/_common.py:7-48; state keys: conv.*, norm.*)."""

    def __init__(self, cin, cout, kernel_size, stride=1, padding=None, bias=True):
        super().__init__()
        kh, kw = _pair(kernel_size)
        if padding is None:
            padding = (kh // 2, kw // 2)
        self.conv = nn.Conv2d(cin, cout, (kh, kw), stride=stride, padding=padding, bias=bias)
        self.norm = nn.BatchNorm2d(cout)
        self.activation = _lrelu()

    def forward(self, x):
        return self.activation(self.norm(self.conv(x)))


class RepVGGBlock(nn.Module):
    """Train-form 3-branch RepVGG cell (reference modules/_common.py:51-95):
    conv3x3+BN, conv1x1+BN, and an identity BN when stride 1 and channels
    match; LeakyReLU(0.2) on the sum."""

    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv3x3 = ConvBorINorm(cin, cout, 3, stride=stride, padding=1, bias=False)
        self.conv1x1 = ConvBorINorm(cin, cout, 1, stride=stride, padding=0, bias=False)
        self.identity = nn.BatchNorm2d(cout) if (stride == 1 and cin == cout) else nn.Identity()
        self.activation = _lrelu()

    def forward(self, x):
        y = self.conv3x3.norm(self.conv3x3.conv(x)) + self.conv1x1.norm(self.conv1x1.conv(x))
        if not isinstance(self.identity, nn.Identity):
            y = y + self.identity(x)
        return self.activation(y)


# note: the reference runs each RepVGG branch through the full ConvBorINorm
# (including its activation) — check forward() there: it calls self.conv3x3(x)
# which applies LeakyReLU per branch BEFORE summing. Reproduce that exactly.
class RepVGGBlockRef(RepVGGBlock):
    def forward(self, x):
        y = self.conv3x3(x) + self.conv1x1(x)
        if not isinstance(self.identity, nn.Identity):
            y = y + self.identity(x)
        return self.activation(y)


class RepBlock(nn.Module):
    """n chained RepVGG cells (reference modules/_common.py:148-158)."""

    def __init__(self, cin, cout, n=2):
        super().__init__()
        self.conv1 = RepVGGBlockRef(cin, cout)
        self.blocks = (
            nn.Sequential(*[RepVGGBlockRef(cout, cout) for _ in range(n - 1)])
            if n > 1 else nn.Identity()
        )

    def forward(self, x):
        return self.blocks(self.conv1(x))


class BiCModule(nn.Module):
    """Bi-directional concat fusion (reference modules/_common.py:161-185)."""

    def __init__(self, c1_ch, c0_ch, p2_ch, cout, e=0.5):
        super().__init__()
        ch = int(cout * e)
        self.upsample_layer = nn.Upsample(scale_factor=(1, 2), mode="bilinear")
        self.down_sample = nn.Upsample(scale_factor=(1, 0.5), mode="bilinear")
        self.conv_c1 = ConvBorINorm(c1_ch, ch, 1)
        self.conv_c0 = ConvBorINorm(c0_ch, ch, 1)
        self.conv_out = ConvBorINorm(ch + ch + p2_ch, cout, 1)

    def forward(self, c1, c0, p2):
        parts = (self.conv_c1(c1), self.down_sample(self.conv_c0(c0)), self.upsample_layer(p2))
        return self.conv_out(torch.cat(parts, dim=1))


class CSPSPPFModule(nn.Module):
    """CSP split + chained 5x5 max-pool SPPF (reference modules/_common.py:188-215)."""

    def __init__(self, cin, cout, e=0.5, pool_kernel_size=5):
        super().__init__()
        ch = int(cout * e)
        self.conv_1_3_4 = nn.Sequential(
            ConvBorINorm(cin, ch, 1), ConvBorINorm(ch, ch, 3), ConvBorINorm(ch, ch, 1)
        )
        self.conv2 = ConvBorINorm(cin, ch, 1)
        self.pool = nn.MaxPool2d(pool_kernel_size, stride=1, padding=pool_kernel_size // 2)
        self.conv5 = ConvBorINorm(ch * 4, ch, 1)
        self.conv6 = ConvBorINorm(ch, ch, 3)
        self.conv7 = ConvBorINorm(ch * 2, cout, 1)

    def forward(self, x):
        a = self.conv_1_3_4(x)
        side = self.conv2(x)
        p1 = self.pool(a)
        p2 = self.pool(p1)
        p3 = self.pool(p2)
        a = self.conv6(self.conv5(torch.cat((a, p1, p2, p3), dim=1)))
        return self.conv7(torch.cat((a, side), dim=1))


class MultiScaleFmapModule(nn.Module):
    """Neck + head convs (reference modules/_common.py:218-265)."""

    def __init__(self, f1_ch, f2_ch, f3_ch, f4_ch, out_channels):
        super().__init__()
        ch = 128
        self.cspsppf = CSPSPPFModule(f4_ch, ch)
        self.bic2 = BiCModule(f2_ch, f1_ch, ch, ch)
        self.bic3 = BiCModule(f3_ch, f2_ch, ch, ch)
        self.rep_block2_1 = RepBlock(ch, out_channels)
        self.rep_block3_1 = RepBlock(ch, ch)
        self.rep_block3_2 = RepBlock(ch * 2, out_channels)
        self.rep_block4_1 = RepBlock(ch * 2, out_channels)
        self.identity = nn.Identity()
        self.conv2_downsample = ConvBorINorm(out_channels, ch, 3, stride=(1, 2))
        self.conv3_downsample = ConvBorINorm(out_channels, ch, 3, stride=(1, 2))

    @staticmethod
    def _flatten_h(t):
        return F.adaptive_avg_pool2d(t, output_size=(1, t.shape[-1]))

    def forward(self, f1, f2, f3, f4):
        if f1.shape[-2] != f2.shape[-2] != f3.shape[-2] != f4.shape[-2]:
            f1, f2, f3, f4 = (self._flatten_h(t) for t in (f1, f2, f3, f4))
        p4 = self.cspsppf(f4)
        p3 = self.rep_block3_1(self.bic3(f3, f2, p4))
        p2 = self.rep_block2_1(self.bic2(f2, f1, p3))
        n2 = self.identity(p2)
        n3 = self.rep_block3_2(torch.cat((p3, self.conv2_downsample(n2)), dim=1))
        n4 = self.rep_block4_1(torch.cat((p4, self.conv3_downsample(n3)), dim=1))
        outs = []
        for t in (n2, n3, n4):
            outs.append(self._flatten_h(t).squeeze(dim=2).permute(0, 2, 1))
        return tuple(outs)


# ---------------------------------------------------------------------------
# Custom backbone (reference modules/_backbone.py:8-116)
# ---------------------------------------------------------------------------


class ExtractorLayer(nn.Module):
    def __init__(self, cin, cout, dropout=0.0, halve_w=False, halve_h=False):
        super().__init__()
        res_out = cout // 2
        out = cout - res_out
        ws = 2 if halve_w else 1
        hs = 2 if halve_h else 1
        self._layer = nn.Sequential(
            nn.Conv2d(cin, 32, (3, 7), stride=(1, ws), padding=(1, 3)),
            nn.BatchNorm2d(32),
            _lrelu(),
            nn.Conv2d(32, out, (3, 7), stride=(hs, 1), padding=(1, 3)),
            nn.BatchNorm2d(out),
            nn.Dropout(dropout),
        )
        # the reference's `if not (h_stride or w_stride)` guard is always
        # false (strides are 1 or 2), so the residual 1x1 conv always exists
        self._res_layer = nn.Conv2d(cin, res_out, 1, stride=(hs, ws))

    def forward(self, x):
        return torch.cat((self._layer(x), self._res_layer(x)), dim=1)


class ExtractorBlock(nn.Module):
    def __init__(self, cin, cout, num_layers, dropout=0.0):
        super().__init__()
        layers = {}
        c, grow = cin, 64
        for i in range(num_layers):
            last = i + 1 == num_layers
            layers[f"layer{i}"] = ExtractorLayer(
                c, cout if last else grow, dropout=dropout, halve_w=last
            )
            c = cout if last else grow
            grow *= 2
        self.module_dict = nn.ModuleDict(layers)

    def forward(self, x):
        for m in self.module_dict.values():
            x = m(x)
        return x


class CustomBackBone(nn.Module):
    def __init__(self, in_channels, dropout=0.0, block_layers=None):
        super().__init__()
        bl = list(block_layers or [3, 4, 6, 3])
        self.first_conv = nn.Sequential(
            nn.Conv2d(in_channels, 64, 7, stride=1, padding=3), nn.BatchNorm2d(64), _lrelu()
        )
        self.entry_block = ExtractorBlock(64, 64, 2, dropout=dropout)
        self.block1 = ExtractorBlock(64, 128, bl[0], dropout=dropout)
        self.block2 = ExtractorBlock(128, 256, bl[1], dropout=dropout)
        self.block3 = ExtractorBlock(256, 512, bl[2], dropout=dropout)
        self.block4 = ExtractorBlock(512, 1024, bl[3], dropout=dropout)
        self.fmap_chs = (128, 256, 512, 1024)

    def forward(self, x):
        x = self.entry_block(self.first_conv(x))
        f1 = self.block1(x)
        f2 = self.block2(f1)
        f3 = self.block3(f2)
        f4 = self.block4(f3)
        return f1, f2, f3, f4


# ---------------------------------------------------------------------------
# ResNet backbone with torchvision state-dict naming
# (reference modules/_backbone.py:119-152 subclasses torchvision ResNet;
# torchvision is absent here, so the skeleton is re-created with the same
# public layer naming: conv1/bn1/layerN.M.{conv1,bn1,...,downsample.{0,1}})
# ---------------------------------------------------------------------------


class _BasicBlock(nn.Module):
    expansion = 1

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 3, stride=stride, padding=1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return self.relu(y + idn)


class _Bottleneck(nn.Module):
    expansion = 4

    def __init__(self, cin, planes, stride=1, downsample=None):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, planes, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(planes)
        self.conv2 = nn.Conv2d(planes, planes, 3, stride=stride, padding=1, bias=False)
        self.bn2 = nn.BatchNorm2d(planes)
        self.conv3 = nn.Conv2d(planes, planes * 4, 1, bias=False)
        self.bn3 = nn.BatchNorm2d(planes * 4)
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = self.relu(self.bn1(self.conv1(x)))
        y = self.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return self.relu(y + idn)


class ResNetBackBone(nn.Module):
    def __init__(self, in_channels, dropout=0.0, block="BasicBlock", block_layers=None):
        super().__init__()
        blk = _BasicBlock if block in ("BasicBlock", _BasicBlock) else _Bottleneck
        bl = list(block_layers or [3, 4, 6, 3])
        self.conv1 = nn.Conv2d(in_channels, 64, 7, stride=2, padding=3, bias=False)
        self.conv2 = nn.Conv2d(64, 64, 7, stride=2, padding=3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.dropout = nn.Dropout(dropout)
        self._cin = 64
        self.layer1 = self._stage(blk, 64, bl[0], 1)
        self.layer2 = self._stage(blk, 128, bl[1], 2)
        self.layer3 = self._stage(blk, 256, bl[2], 2)
        self.layer4 = self._stage(blk, 512, bl[3], 2)
        e = blk.expansion
        self.fmap_chs = (64 * e, 128 * e, 256 * e, 512 * e)

    def _stage(self, blk, planes, n, stride):
        down = None
        if stride != 1 or self._cin != planes * blk.expansion:
            down = nn.Sequential(
                nn.Conv2d(self._cin, planes * blk.expansion, 1, stride=stride, bias=False),
                nn.BatchNorm2d(planes * blk.expansion),
            )
        blocks = [blk(self._cin, planes, stride, down)]
        self._cin = planes * blk.expansion
        blocks += [blk(self._cin, planes) for _ in range(n - 1)]
        return nn.Sequential(*blocks)

    def forward(self, x):
        x = self.dropout(self.relu(self.bn1(self.conv2(self.conv1(x)))))
        f1 = self.layer1(x)
        f2 = self.layer2(f1)
        f3 = self.layer3(f2)
        f4 = self.layer4(f3)
        return f1, f2, f3, f4


# ---------------------------------------------------------------------------
# Full network head (reference modules/_architecture.py:10-156, frontend-free)
# ---------------------------------------------------------------------------


class TorchAudioDetectionNetwork(nn.Module):
    """Reference AudioDetectionNetwork with the torchaudio frontend removed:
    ``forward`` takes the precomputed spectral image (B, 2, n_mels, T). The
    parameter/buffer tree (sm/md/lg anchors, taper_window, feature_extractor,
    multiscale_module) matches the reference's state_dict naming, so a
    ``torch.save`` of this model is byte-layout-identical to a genuine
    reference checkpoint minus the (skipped) torchaudio transform buffers."""

    def __init__(self, num_classes, config):
        super().__init__()
        self.config = config
        self.num_classes = num_classes
        self.out_channels = config["num_anchors"] * (3 + num_classes)
        self.register_buffer("taper_window", torch.empty(0), persistent=True)
        dur = config["sample_duration"]
        train_anchors = config["train_anchors"]
        for key in ("sm", "md", "lg"):
            setattr(self, f"{key}_anchors", nn.Parameter(
                torch.tensor(config["anchors"][key], dtype=torch.float32) / dur,
                requires_grad=train_anchors,
            ))
        if config["backbone"] == "custom":
            self.feature_extractor = CustomBackBone(
                2, dropout=config["dropout"], block_layers=config["block_layers"]
            )
        else:
            self.feature_extractor = ResNetBackBone(
                2, dropout=config["dropout"], block_layers=config["block_layers"],
                **config.get("resnet_config", {}),
            )
        self.multiscale_module = MultiScaleFmapModule(
            *self.feature_extractor.fmap_chs, out_channels=self.out_channels
        )

    def forward(self, x_spectral, combine_scales=False):
        dur = self.config["sample_duration"]
        spectral_size = x_spectral.shape[-1]
        fmaps = self.feature_extractor(x_spectral)
        sm, md, lg = self.multiscale_module(*fmaps)
        sm = self._decode(sm, self.sm_anchors * dur, spectral_size, dur)
        md = self._decode(md, self.md_anchors * dur, spectral_size, dur)
        lg = self._decode(lg, self.lg_anchors * dur, spectral_size, dur)
        if not combine_scales:
            return sm, md, lg
        b = x_spectral.shape[0]
        flat = [t.reshape(b, -1, self.num_classes + 3) for t in (sm, md, lg)]
        return torch.cat(flat, dim=1)

    def _decode(self, raw, anchors_sec, spectral_size, dur):
        # reference get_scale_pred (modules/_architecture.py:132-156)
        b, g, _ = raw.shape
        a = anchors_sec.shape[0]
        p = raw.reshape(b, g, a, -1)
        obj = p[..., :1]
        cls = p[..., 1:1 + self.num_classes]
        stride = spectral_size // g
        center_scaler = spectral_size / dur
        grid = torch.arange(g, dtype=p.dtype)[None, :, None, None]
        centers = (p[..., -2:-1].sigmoid() * 2 - 0.5) + grid
        centers = (centers * stride / center_scaler).clip(0, dur)
        widths = ((p[..., -1:].sigmoid() * 2) ** 2 * anchors_sec[:, None]).clip(0, dur)
        return torch.cat((obj, cls, centers, widths), dim=-1)


def randomize_(model: nn.Module, seed: int = 0) -> None:
    """Fill every param and BN buffer with seeded non-trivial values so the
    eval-mode forward exercises real normalization statistics."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for name, t in list(model.named_parameters()) + list(model.named_buffers()):
            if t.numel() == 0 or name.endswith("num_batches_tracked"):
                continue
            if name.endswith("running_var"):
                t.copy_(torch.rand(t.shape, generator=g) * 0.8 + 0.3)
            elif name.endswith(("_anchors",)):
                continue  # keep the config anchor values
            else:
                t.copy_(torch.randn(t.shape, generator=g) * 0.1)


# ---- reference event post-processing oracle --------------------------------


def _nms_interval(x1, x2, scores, iou_threshold):
    """torchvision.ops.nms keep order for equal-height pseudo-boxes: kept
    indices in descending score order; a box is suppressed iff IoU with an
    already-kept higher-scored box is strictly > threshold."""
    order = np.argsort(-scores, kind="stable")
    suppressed = np.zeros(len(scores), bool)
    keep = []
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        inter = np.maximum(
            0.0, np.minimum(x2[i], x2) - np.maximum(x1[i], x1)
        )
        union = (x2[i] - x1[i]) + (x2 - x1) - inter
        iou = inter / np.maximum(union, 1e-12)
        suppressed |= iou > iou_threshold
    return np.asarray(keep, np.int64)


def process_model_outputs_ref(
    outputs,
    iou_threshold: float = 0.1,
    conf_threshold: float = 0.2,
    sample_duration: float = 60.0,
    return_start_end: bool = True,
):
    """Faithful numpy re-implementation of the reference's
    ``process_model_outputs`` (``inference.py:42-110``): per-clip batched NMS
    on (center,width) intervals lifted to equal-height boxes, a confidence
    filter AFTER suppression, then per-clip center-ordered event rows.

    ``outputs``: (B, K, 3+C) decoded predictions
    ``[obj_logit, class_logits..., center_sec, width_sec]``.
    Returns a list (len B) of rows ``(confidence, obj_logit, class_idx,
    start, end)`` — start/end already clipped to [0, sample_duration].
    """
    out = np.asarray(outputs.detach() if hasattr(outputs, "detach") else outputs,
                     np.float64)
    assert out.ndim == 3
    c = out[..., -2]
    w = out[..., -1]
    x1 = np.clip(c - w / 2.0, 0.0, sample_duration)
    x2 = np.clip(c + w / 2.0, 0.0, sample_duration)
    obj = 1.0 / (1.0 + np.exp(-out[..., 0]))
    logits = out[..., 1:-2]
    e = np.exp(logits - logits.max(axis=-1, keepdims=True))
    cls = e / e.sum(axis=-1, keepdims=True)
    conf = obj * cls.max(axis=-1)

    events = []
    for b in range(out.shape[0]):
        keep = _nms_interval(x1[b], x2[b], conf[b], iou_threshold)
        keep = keep[conf[b][keep] > conf_threshold]
        # reference sorts surviving segments by (already clipped in the
        # decode) center before emitting rows (inference.py:93-96)
        keep = keep[np.argsort(c[b][keep], kind="stable")]
        rows = []
        for j in keep:
            if return_start_end:
                t0 = float(np.clip(c[b, j] - w[b, j] / 2.0, 0.0, sample_duration))
                t1 = float(np.clip((c[b, j] - w[b, j] / 2.0) + w[b, j], 0.0, sample_duration))
            else:
                t0, t1 = float(c[b, j]), float(w[b, j])
            rows.append((
                float(conf[b, j]), float(out[b, j, 0]),
                int(np.argmax(out[b, j, 1:-2])), t0, t1,
            ))
        events.append(rows)
    return events
