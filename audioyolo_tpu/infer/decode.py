"""Jitted inference decode: model forward + NMS + fixed-K compaction.

Equivalent of the reference's ``process_model_outputs`` (``inference.py:42-110``)
but fully in-graph: one compiled XLA program takes a waveform batch and returns
fixed-capacity detection arrays (confidence, objectness, class, center, width,
valid), so the host only does trivial masking/ordering per clip.

The survivors are compacted to the front of a ``keep_k`` capacity axis by
sorting on ``(survived, confidence)`` — no data-dependent shapes anywhere.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.nms import batched_interval_nms


def detection_postprocess_graph(
    preds: jax.Array,
    iou_threshold: float,
    conf_threshold: float,
    sample_duration: float,
    keep_k: int,
) -> Dict[str, jax.Array]:
    """(B, K, 3+C) combined predictions -> fixed-(B, keep_k) detection dict."""
    order, keep, conf = batched_interval_nms(
        preds, iou_threshold, conf_threshold, sample_duration
    )
    # Compact survivors first (by confidence), then everything else — one
    # stable multi-operand sort carrying ids/flags/scores with the key.
    composite = keep.astype(jnp.float32) * 2.0 + conf
    _, idx, valid, confidence = jax.lax.sort(
        (-composite, order, keep, conf), dimension=-1, num_keys=1, is_stable=True
    )
    idx = idx[:, :keep_k]  # original proposal ids
    valid = valid[:, :keep_k]
    confidence = confidence[:, :keep_k]

    sel = jnp.take_along_axis(preds, idx[..., None], axis=1)  # (B, keep_k, 3+C)
    objectness = jax.nn.sigmoid(sel[..., 0])
    class_idx = jnp.argmax(sel[..., 1:-2], axis=-1)
    centers = jnp.clip(sel[..., -2], 0.0, sample_duration)
    widths = jnp.clip(sel[..., -1], 0.0, sample_duration)
    return {
        "confidence": confidence,
        "objectness": objectness,
        "class_idx": class_idx.astype(jnp.int32),
        "center": centers,
        "width": widths,
        "valid": valid,
    }


def pack_detections(dets: Dict[str, jax.Array]) -> jax.Array:
    """Detection dict -> one (B, K, 6) f32 tensor
    [confidence, objectness, class_idx, center, width, valid] so a remote host
    fetches one buffer instead of six (each device->host fetch pays a full
    round trip through a tunnelled runtime)."""
    return jnp.stack(
        [
            dets["confidence"],
            dets["objectness"],
            dets["class_idx"].astype(jnp.float32),
            dets["center"],
            dets["width"],
            dets["valid"].astype(jnp.float32),
        ],
        axis=-1,
    )


def unpack_detections(arr: np.ndarray) -> Dict[str, np.ndarray]:
    arr = np.asarray(arr)
    return {
        "confidence": arr[..., 0],
        "objectness": arr[..., 1],
        "class_idx": arr[..., 2].astype(np.int32),
        "center": arr[..., 3],
        "width": arr[..., 4],
        "valid": arr[..., 5] > 0.5,
    }


def make_inference_fn(
    model,
    variables: Dict[str, Any],
    iou_threshold: float = 0.1,
    conf_threshold: float = 0.2,
    keep_k: int = 128,
    mesh=None,
    data_axis: str = "data",
    packed: bool = False,
    int8_input: bool = False,
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """Build the jitted waveform -> detections function.

    ``model`` should normally be the ``deploy=True`` (RepVGG-folded) model with
    folded variables — the reference ships but never invokes its fold at
    inference (``inference.py`` note in SURVEY.md §3.3); we fold by default at
    weight load.

    Pass a ``jax.sharding.Mesh`` to shard the clip batch over its ``data``
    axis (replicated weights): inference scales across chips with zero model
    changes — each device runs independent clips, no collectives on the hot
    path (SURVEY.md §2.3 item 3).

    ``int8_input=True``: the returned fn takes ``(q, scale)`` — an int8 clip
    batch (B, 1, S) plus its per-clip f32 dequant multipliers (B,) from
    :func:`audioyolo_tpu.infer.streaming.quantize_clips_int8` — and
    dequantizes in-graph before the frontend. Transfer-bound streaming ships
    half the bytes of the int16 path (docs/PERFORMANCE.md: the host->device
    pipe, not compute, caps long-form streaming on tunnelled deployments).
    """
    duration = float(model.cfg.sample_duration)

    def infer_impl(v, audio: jax.Array):
        if int8_input:
            q, scale = audio
            audio = q.astype(jnp.float32) * scale[:, None, None]
        preds = model.apply(v, audio, train=False, combine_scales=True)
        dets = detection_postprocess_graph(
            preds, iou_threshold, conf_threshold, duration, keep_k
        )
        return pack_detections(dets) if packed else dets

    # Weights ride as jit ARGUMENTS (device-resident once, at build time),
    # not closed-over constants: embedding ~50 MB of params into every
    # compiled program made each executable ~100 MB — slow to compile, slow
    # to load from the persistent compile cache, and re-shipped per program
    # (single-dispatch, multi-dispatch and scaled postures each re-embed the
    # same weights). As arguments the programs stay small and the weight
    # upload happens exactly once.
    if mesh is None:
        dev_vars = jax.device_put(variables)
        jitted = jax.jit(infer_impl)

        def infer(audio):
            return jitted(dev_vars, audio)

        infer.jitted = jitted  # for cost_analysis / AOT introspection
        infer.dev_vars = dev_vars
        return infer

    from jax.sharding import NamedSharding, PartitionSpec as P

    data = NamedSharding(mesh, P(data_axis))
    repl = NamedSharding(mesh, P())
    dev_vars = jax.device_put(variables, repl)
    jitted = jax.jit(infer_impl, in_shardings=(repl, data), out_shardings=data)

    def infer(audio: jax.Array) -> Dict[str, jax.Array]:
        return jitted(dev_vars, jax.device_put(audio, data))

    infer.jitted = jitted  # same introspection surface as the single-device
    infer.dev_vars = dev_vars  # branch (bench.py cost_analysis/AOT probing)
    return infer


def make_multi_inference_fn(
    model,
    variables: Dict[str, Any],
    n_batches: int,
    iou_threshold: float = 0.1,
    conf_threshold: float = 0.2,
    keep_k: int = 128,
    packed: bool = False,
):
    """Like :func:`make_inference_fn`, but one compiled program runs
    ``n_batches`` full forward+decode passes per host dispatch.

    Host dispatch through a remote-tunnelled runtime costs ~2-3 ms per
    jitted call on a 1-core host (measured: 17.6 ms wall vs 14.5 ms device
    at B=256); unrolling N batches into a single program amortizes it N-fold
    without growing the per-batch memory footprint the way a bigger batch
    would. Batches stay separate device buffers (no stacking copies).

    Returns ``fn(audios: sequence of N arrays) -> tuple of N outputs``.
    """
    duration = float(model.cfg.sample_duration)

    def infer_impl(v, *audios):
        outs = []
        for a in audios:
            preds = model.apply(v, a, train=False, combine_scales=True)
            dets = detection_postprocess_graph(
                preds, iou_threshold, conf_threshold, duration, keep_k
            )
            outs.append(pack_detections(dets) if packed else dets)
        return tuple(outs)

    # weights as runtime arguments, same rationale as make_inference_fn
    dev_vars = jax.device_put(variables)
    jitted = jax.jit(infer_impl)

    def infer(audios):
        # a wrong count would silently trace+compile a SECOND program
        # (20-180 s through the remote compiler) instead of erroring
        if len(audios) != n_batches:
            raise ValueError(
                f"make_multi_inference_fn built for {n_batches} batches per "
                f"dispatch, got {len(audios)}"
            )
        return jitted(dev_vars, *audios)

    infer.jitted = jitted  # for cost_analysis / AOT introspection
    infer.dev_vars = dev_vars
    return infer


def postprocess_detections(
    dets: Dict[str, np.ndarray],
    sample_duration: float,
    return_start_end: bool = True,
) -> list:
    """Host-side: fixed arrays -> per-clip lists of detection rows sorted by
    center (reference ``inference.py:91-110``). Each row:
    ``(confidence, objectness_logit? -> objectness, class_idx, start, end)``
    (or center/width when ``return_start_end=False``)."""
    out = []
    b = dets["valid"].shape[0]
    for i in range(b):
        v = dets["valid"][i]
        rows, centers = [], []
        for j in np.nonzero(v)[0]:
            c, w = float(dets["center"][i, j]), float(dets["width"][i, j])
            if return_start_end:
                start = min(max(c - w / 2.0, 0.0), sample_duration)
                end = min(max(c + w / 2.0, 0.0), sample_duration)
                t0, t1 = start, end
            else:
                t0, t1 = c, w
            centers.append(c)
            rows.append(
                (
                    float(dets["confidence"][i, j]),
                    float(dets["objectness"][i, j]),
                    int(dets["class_idx"][i, j]),
                    t0,
                    t1,
                )
            )
        # order by the decoded (clipped) CENTER, exactly like the reference
        # (inference.py:95 sorts segments[:, -2]) — the start/end midpoint
        # differs for events truncated at a clip edge
        rows = [r for _, r in sorted(zip(centers, rows), key=lambda p: p[0])]
        out.append(rows)
    return out
