"""PyTorch reference-checkpoint importer.

Maps the reference's ``torch.save({"network_params": state_dict, ...})``
checkpoints (``pipeline/_trainer.py:43-46``) onto this framework's flax
variable tree so trained reference models run at numerical parity
(BASELINE.md). The name translation covers both backbones and the full neck:

==========================================  =====================================
reference torch key                         flax path
==========================================  =====================================
sm_anchors                                  params/sm_anchors
feature_extractor.conv1.weight              feature_extractor/conv1/conv/kernel
feature_extractor.bn1.weight                feature_extractor/bn1/scale
feature_extractor.layer2.0.conv1.weight     feature_extractor/layer2_0/conv1/...
...layer2.0.downsample.0.weight             .../layer2_0/downsample_conv/...
first_conv.0.weight (custom)                feature_extractor/first_conv/conv/...
entry_block.module_dict.layer0._layer.0.*   .../entry_block/layer0/conv_a/...
multiscale_module.cspsppf.conv_1_3_4.1.*    multiscale_module/cspsppf/conv3/...
...rep_block3_2.blocks.0.conv3x3.conv.*     .../rep_block3_2/block0/conv3x3/...
==========================================  =====================================

Conv kernels transpose OIHW -> HWIO; BatchNorm ``weight``/``bias`` become
``scale``/``bias`` with running stats going to the ``batch_stats`` collection.
Frontend buffers (resample kernel, mel fb, DCT, windows) are recomputed, not
imported. ``num_batches_tracked`` is ignored.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List, Tuple

import numpy as np

# leaf-name translation: (flax leaf path suffix) -> (torch suffix, transform)
_CONV_T = lambda w: np.transpose(w, (2, 3, 1, 0))  # noqa: E731  OIHW -> HWIO
_ID = lambda w: w  # noqa: E731


def _module_to_torch(parts: List[str]) -> List[str]:
    """Translate one flax module path (no leaf) into torch attribute parts."""
    out: List[str] = []
    i = 0
    while i < len(parts):
        p = parts[i]
        m = re.fullmatch(r"layer(\d)_(\d+)", p)
        if m:  # resnet stage block
            out += [f"layer{m.group(1)}", m.group(2)]
        elif p == "downsample_conv":
            out += ["downsample", "0"]
        elif p == "downsample_bn":
            out += ["downsample", "1"]
        elif p == "first_conv":
            out += ["first_conv", "0"]
        elif p == "first_bn":
            out += ["first_conv", "1"]
        elif re.fullmatch(r"block\d+", p) and i > 0 and parts[i - 1] in (
            "rep_block2_1", "rep_block3_1", "rep_block3_2", "rep_block4_1",
        ):  # RepBlock chain
            out += ["blocks", p[len("block"):]]
        elif re.fullmatch(r"layer\d+", p) and i > 0 and (
            parts[i - 1].startswith("block") or parts[i - 1] == "entry_block"
        ):  # custom-backbone ExtractorBlock layer
            out += ["module_dict", p]
        elif p == "conv_a":
            out += ["_layer", "0"]
        elif p == "bn_a":
            out += ["_layer", "1"]
        elif p == "conv_b":
            out += ["_layer", "3"]
        elif p == "bn_b":
            out += ["_layer", "4"]
        elif p == "res_conv":
            out += ["_res_layer"]
        elif p == "conv1" and i > 0 and parts[i - 1] == "cspsppf":
            out += ["conv_1_3_4", "0"]
        elif p == "conv3" and i > 0 and parts[i - 1] == "cspsppf":
            out += ["conv_1_3_4", "1"]
        elif p == "conv4" and i > 0 and parts[i - 1] == "cspsppf":
            out += ["conv_1_3_4", "2"]
        else:
            out.append(p)
        i += 1
    return out


def flax_path_to_torch_key(collection: str, path: Tuple[str, ...]) -> Tuple[str, Any]:
    """Returns (torch_key, transform) for one flattened flax variable path."""
    parts = list(path)
    leaf = parts.pop()

    # ConvNorm / Conv2d wrappers insert a trailing "conv" module level that
    # torch doesn't have when the parent is itself the conv attribute:
    #   .../conv/conv/kernel  -> ....conv.weight      (ConvNorm)
    #   .../conv1/conv/kernel -> ....conv1.weight     (bare Conv2d wrapper)
    if parts and parts[-1] == "conv" and len(parts) >= 2 and parts[-2] == "conv":
        parts.pop()  # ConvNorm: drop the inner wrapper level only
    elif parts and parts[-1] == "conv" and leaf in ("kernel", "bias"):
        parts.pop()  # bare Conv2d wrapper (e.g. resnet conv1, reparam)

    torch_parts = _module_to_torch(parts)

    if collection == "params":
        if leaf == "kernel":
            return ".".join(torch_parts + ["weight"]), _CONV_T
        if leaf == "scale":  # BatchNorm gamma
            return ".".join(torch_parts + ["weight"]), _ID
        if leaf == "bias":
            return ".".join(torch_parts + ["bias"]), _ID
        if leaf in ("sm_anchors", "md_anchors", "lg_anchors"):
            return leaf, _ID
        raise KeyError(f"unmapped param leaf {path}")
    else:  # batch_stats
        if leaf == "mean":
            return ".".join(torch_parts + ["running_mean"]), _ID
        if leaf == "var":
            return ".".join(torch_parts + ["running_var"]), _ID
        raise KeyError(f"unmapped stat leaf {path}")


_SKIP_PATTERNS = (
    "taper_window",
    "resampler.",
    "melspectogram_tfmr.",
    "mfcc_tfmr.",
    "num_batches_tracked",
)


def import_torch_state_dict(
    torch_state: Dict[str, np.ndarray],
    template_variables: Dict[str, Any],
    strict: bool = True,
) -> Dict[str, Any]:
    """Fill a flax variables template from a reference torch state dict.

    ``torch_state``: flat name->array dict (numpy; call ``.numpy()`` on torch
    tensors or use :func:`load_torch_checkpoint`).
    ``template_variables``: ``{"params": ..., "batch_stats": ...}`` from
    ``model.init`` / ``jax.eval_shape`` with matching architecture.
    """
    used = set()
    out: Dict[str, Any] = {}
    for collection in ("params", "batch_stats"):
        tmpl = template_variables.get(collection, {})
        flat = _flatten(tmpl)
        filled = {}
        for path, leaf_val in flat.items():
            key, tfm = flax_path_to_torch_key(collection, path)
            if key not in torch_state:
                raise KeyError(
                    f"reference checkpoint is missing '{key}' "
                    f"(needed for {collection}{'/'.join(path)})"
                )
            arr = tfm(np.asarray(torch_state[key]))
            expected = tuple(leaf_val.shape)
            if tuple(arr.shape) != expected:
                raise ValueError(
                    f"shape mismatch for '{key}': torch {arr.shape} vs flax {expected}"
                )
            filled[path] = arr.astype(np.float32)
            used.add(key)
        out[collection] = _unflatten(filled)

    if strict:
        leftovers = [
            k for k in torch_state
            if k not in used and not any(s in k for s in _SKIP_PATTERNS)
        ]
        if leftovers:
            raise ValueError(f"unconsumed reference checkpoint keys: {leftovers[:10]}")
    return out


def load_torch_checkpoint(path: str) -> Dict[str, np.ndarray]:
    """Read a reference ``.pth.tar`` (``{"network_params": ...}``) to numpy."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=True)
    state = payload.get("network_params", payload)
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in state.items()}


def _flatten(tree: Any, prefix: Tuple[str, ...] = ()) -> Dict[Tuple[str, ...], Any]:
    if not isinstance(tree, dict):
        return {prefix: tree}
    out = {}
    for k, v in tree.items():
        out.update(_flatten(v, prefix + (k,)))
    return out


def _unflatten(flat: Dict[Tuple[str, ...], Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for path, val in flat.items():
        node = out
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = val
    return out
