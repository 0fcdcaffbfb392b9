"""Int8 post-training quantization of the detector body.

The v5e MXU runs int8 x int8 -> int32 at twice its bf16 rate, and the folded
deploy graph is a chain of convs whose inputs are bounded activations — a
textbook PTQ target. Mechanics (no reference counterpart; the reference
serves fp32, ``/root/reference/inference.py``):

- **Calibration** (:func:`calibrate_quant`): run representative batches with
  the ``"quant_stats"`` collection mutable; every ``Conv2d`` records its
  input absolute maximum (``models/layers.py`` sow hook). Scales are
  ``absmax / 127`` (symmetric, zero point 0 — the convs' zero padding stays
  exact in the quantized domain).
- **Execution**: passing a ``"quant"`` collection in ``model.apply``
  switches every conv that has an ``s_x`` entry to the int8 kernel
  (``layers._int8_conv``): static per-tensor activation scale,
  per-output-channel weight scales derived from the fp32 params at trace
  time. Params are untouched — one checkpoint serves float and int8, and
  the serving-artifact exporter (infer/export.py) bakes the quantized form
  when given the augmented variables.
- **Selection**: quantization is per-conv, chosen host-side by path
  patterns. Default: quantize the backbone/neck body but keep the stem
  conv(s) and the per-scale prediction heads in float (first/last layers
  carry the most sensitive dynamic range — standard PTQ practice).

Accuracy: on the demo dataset the default selection holds event mAP within
noise of the float model (see tests/test_quant.py and docs/PERFORMANCE.md).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

# Paths kept in float by default: the stem conv sees the raw 2-channel
# spectral image (highest dynamic range, channel-starved anyway), and the
# neck's output RepBlocks emit the raw YOLO predictions that decode reads
# (first/last-layer precision is the standard PTQ concession).
DEFAULT_EXCLUDE = (
    "feature_extractor/conv1/",  # ResNet s2d stem conv (backbone.py:102)
    "feature_extractor/conv2/",  # second 7x7/s2 stem conv (backbone.py:103)
    "feature_extractor/first_conv/",  # CustomBackbone stem (backbone.py:188)
    "rep_block2_1", "rep_block3_2", "rep_block4_1",  # prediction emitters
)


def _flatten_absmax(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], float]:
    out: Dict[Tuple[str, ...], float] = {}
    for k, v in tree.items():
        if k == "in_absmax":
            out[prefix] = float(np.asarray(v))
        elif isinstance(v, dict):
            out.update(_flatten_absmax(v, prefix + (k,)))
    return out


def _nest(flat: Dict[Tuple[str, ...], jax.Array]) -> Dict[str, Any]:
    root: Dict[str, Any] = {}
    for path, leaf in flat.items():
        node = root
        for k in path:
            node = node.setdefault(k, {})
        node["s_x"] = leaf
    return root


def calibrate_quant(
    model,
    variables: Dict[str, Any],
    batches: Iterable[np.ndarray],
    *,
    exclude: Sequence[str] = DEFAULT_EXCLUDE,
    include_only: Optional[Sequence[str]] = None,
) -> Dict[str, Any]:
    """Build the ``"quant"`` variable collection from calibration batches.

    ``batches``: an iterable of model inputs (waveform or framed batches, a
    handful is enough — scales are absmax-based). ``exclude``: convs whose
    "/".joined module path contains any of these substrings stay float.
    ``include_only``: if given, ONLY matching paths are quantized.

    Returns the collection to merge into apply variables:
    ``model.apply({**variables, "quant": col}, x, ...)``.
    """
    apply = jax.jit(
        lambda v, x: model.apply(v, x, train=False, combine_scales=True,
                                 mutable=["quant_stats"])[1]["quant_stats"]
    )
    absmax: Dict[Tuple[str, ...], float] = {}
    for b in batches:
        # tuple batches ((q, scale) framed-int8 entry) pass through as-is
        x = b if isinstance(b, (tuple, list)) else jnp.asarray(b)
        stats = jax.device_get(apply(variables, x))
        for path, v in _flatten_absmax(stats).items():
            absmax[path] = max(absmax.get(path, 0.0), v)
    if not absmax:
        raise ValueError("calibration saw no Conv2d modules (quant_stats empty)")

    def wanted(path: Tuple[str, ...]) -> bool:
        joined = "/".join(path) + "/"
        if include_only is not None:
            return any(s in joined for s in include_only)
        return not any(s in joined for s in exclude)

    flat = {
        p: jnp.float32(max(v, 1e-12) / 127.0)
        for p, v in absmax.items() if wanted(p)
    }
    if not flat:
        raise ValueError(
            f"no convs selected for quantization (exclude={exclude!r}, "
            f"include_only={include_only!r}; saw {len(absmax)} convs)"
        )
    return _nest(flat)


def quantized_paths(quant_col: Dict[str, Any]) -> List[str]:
    """Human-readable list of the convs an existing collection quantizes."""
    return sorted("/".join(p) for p in _flatten_scales(quant_col))


def _flatten_scales(tree: Dict[str, Any], prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], jax.Array]:
    out: Dict[Tuple[str, ...], jax.Array] = {}
    for k, v in tree.items():
        if k == "s_x":
            out[prefix] = v
        elif isinstance(v, dict):
            out.update(_flatten_scales(v, prefix + (k,)))
    return out
