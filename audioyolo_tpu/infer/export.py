"""Serving artifact export: the folded inference graph as portable StableHLO.

The reference's only deployment artifact is a torch ``state_dict`` that needs
the full Python model code (and its exact module tree) to run
(``/root/reference/inference.py:23-31``). A TPU-native framework can do
better: ``jax.export`` lowers the jitted waveform->detections function —
frontend GEMMs, folded backbone/neck, decode and NMS, with the weights baked
in as constants — to a single serialized StableHLO program that any JAX
runtime of a compatible version can execute on TPU or CPU *without any of
this package's code*.

Artifact format (``.aytx``): a zip holding

- ``model.stablehlo`` — ``jax.export.Exported.serialize()`` bytes, lowered
  for ``platforms`` (default TPU + CPU: one artifact serves on either);
- ``meta.json`` — input signature, class map, thresholds, sample rates, and
  the config dict needed to interpret outputs (NOT to rebuild the model).

The exported callable has the packed single-buffer output layout of
``make_inference_fn(packed=True)`` (one device->host fetch per call —
``infer/decode.py::pack_detections``); :func:`load_serving_artifact` returns
a function producing the unpacked ``{confidence, objectness, class_idx,
center, width, valid}`` dict, so downstream post-processing
(:func:`audioyolo_tpu.infer.postprocess_detections`) works unchanged.
"""

from __future__ import annotations

import io
import json
import zipfile
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from .decode import detection_postprocess_graph, pack_detections, unpack_detections

ARTIFACT_VERSION = 1


def build_serving_exported(
    model,
    variables: Dict[str, Any],
    batch_size: int,
    *,
    iou_threshold: float = 0.1,
    conf_threshold: float = 0.2,
    keep_k: int = 128,
    input_dtype: str = "float32",
    framed: bool = False,
    frame_shape: Optional[Tuple[int, int, int]] = None,
    platforms: Sequence[str] = ("tpu", "cpu"),
):
    """Lower the packed inference function to a multi-platform ``Exported``.

    ``input_dtype``: ``"float32"`` or ``"int16"`` (PCM16 waveform shipped
    as-is; the frontend dequantizes in-graph — ``ops/frontend.py:395``), or
    ``"int8"`` with ``framed=True`` — the (q int8 frames, per-clip f32
    scale) tuple entry of the int8-DFT frontend (``frame_host_int8``), the
    serving headline posture. ``framed=True`` exports the phase-grouped-
    frames entry instead of the waveform entry (`frame_shape` =
    (n_ph, n_groups, frame_len) from ``SpectralFrontend.fused``); the host
    then runs ``frame_host``/``frame_host_int8`` and the device only GEMMs.
    """
    duration = float(model.cfg.sample_duration)

    def infer_impl(audio) -> jax.Array:
        preds = model.apply(variables, audio, train=False, combine_scales=True)
        dets = detection_postprocess_graph(
            preds, iou_threshold, conf_threshold, duration, keep_k
        )
        return pack_detections(dets)

    if input_dtype == "int8":
        if not framed or frame_shape is None:
            raise ValueError("input_dtype='int8' is the framed (q, scale) "
                             "entry — pass framed=True and frame_shape")
        spec = (
            jax.ShapeDtypeStruct((batch_size, *frame_shape), jnp.int8),
            jax.ShapeDtypeStruct((batch_size,), jnp.float32),
        )
        return jax.export.export(jax.jit(infer_impl),
                                 platforms=list(platforms))(spec)
    dt = {"float32": jnp.float32, "int16": jnp.int16}[input_dtype]
    if framed:
        if frame_shape is None:
            raise ValueError("framed export needs frame_shape (n_ph, n_groups, frame_len)")
        spec = jax.ShapeDtypeStruct((batch_size, *frame_shape), dt)
    else:
        spec = jax.ShapeDtypeStruct((batch_size, 1, int(model.cfg.clip_samples)), dt)
    return jax.export.export(jax.jit(infer_impl), platforms=list(platforms))(spec)


def save_serving_artifact(
    path: str,
    exported,
    *,
    idx2class_map: Dict[int, str],
    sample_duration: float,
    input_sample_rate: int,
    extra_meta: Optional[Dict[str, Any]] = None,
) -> None:
    """Write the ``.aytx`` zip (StableHLO blob + JSON metadata)."""
    in_avals = exported.in_avals
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "platforms": list(exported.platforms),
        # one entry per input leaf: a single waveform/framed tensor, or the
        # (q int8 frames, f32 scale) pair of the framed-int8 entry
        "input_shape": (list(in_avals[0].shape) if len(in_avals) == 1
                        else [list(a.shape) for a in in_avals]),
        "input_dtype": (str(in_avals[0].dtype) if len(in_avals) == 1
                        else [str(a.dtype) for a in in_avals]),
        "idx2class_map": {str(k): v for k, v in idx2class_map.items()},
        "sample_duration": float(sample_duration),
        "input_sample_rate": int(input_sample_rate),
    }
    if extra_meta:
        meta.update(extra_meta)
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("model.stablehlo", exported.serialize())
        z.writestr("meta.json", json.dumps(meta, indent=1))
    with open(path, "wb") as f:
        f.write(buf.getvalue())


def load_serving_artifact(
    path: str,
) -> Tuple[Callable[[np.ndarray], Dict[str, np.ndarray]], Dict[str, Any]]:
    """Load an ``.aytx`` artifact -> ``(infer_fn, meta)``.

    ``infer_fn(audio)`` runs the deserialized program on the current default
    JAX backend (it must be one of ``meta["platforms"]``) and returns the
    unpacked detections dict of numpy arrays. No model code or checkpoint is
    touched — the weights live inside the program.
    """
    with zipfile.ZipFile(path) as z:
        blob = z.read("model.stablehlo")
        meta = json.loads(z.read("meta.json"))
    ver = meta.get("artifact_version")
    if ver != ARTIFACT_VERSION:
        raise ValueError(
            f"unsupported artifact version {ver!r} (this loader handles "
            f"{ARTIFACT_VERSION}) — re-export with tools/export_model.py"
        )
    meta["idx2class_map"] = {int(k): v for k, v in meta["idx2class_map"].items()}
    exported = jax.export.deserialize(blob)
    call = jax.jit(exported.call)

    def infer_fn(audio: np.ndarray) -> Dict[str, np.ndarray]:
        packed = np.asarray(call(audio))
        return unpack_detections(packed)

    return infer_fn, meta
