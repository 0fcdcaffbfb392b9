"""Worker-side factory for the StreamWorkerPool tests.

Imported by pool worker subprocesses via ``factory="pool_factory:build"``
with ``PYTHONPATH`` pointing at ``tests/``. Builds a seed-deterministic
tiny model (same PRNGKey init in every process), so parent and workers
compute identical detections.
"""

from __future__ import annotations


def build(seed: int = 0, int8_input: bool = False, framed_int8: bool = False):
    """``framed_int8``: build the int8-DFT-frontend model and return the
    quantizing host framer — clips ship as framed-int8 (q, scale) tuples
    (``transfer='int8'`` + ``frame_fn`` in evaluate_audio)."""
    import copy

    import jax
    import jax.numpy as jnp
    import numpy as np

    from conftest import TINY_CFG
    from audioyolo_tpu.config import Config
    from audioyolo_tpu.infer import make_inference_fn
    from audioyolo_tpu.models import AudioDetectionModel, fold_repvgg

    raw = copy.deepcopy(TINY_CFG)
    if framed_int8:
        raw.setdefault("tpu_config", {})["frontend_precision"] = "int8"
    cfg = Config(raw)
    model = AudioDetectionModel.from_config(cfg, num_classes=2)
    x = jnp.zeros((1, 1, cfg.clip_samples))
    key = jax.random.PRNGKey(seed)
    variables = jax.jit(lambda r, a: model.init(r, a, train=False))(
        {"params": key, "dropout": key}, x
    )
    folded = fold_repvgg(jax.tree.map(np.asarray, variables))
    deploy = AudioDetectionModel.from_config(cfg, num_classes=2, deploy=True)
    frame_fn = None
    if framed_int8:
        from audioyolo_tpu.ops.frontend import SpectralFrontend

        frame_fn = SpectralFrontend(cfg).frame_host_int8
    return make_inference_fn(deploy, folded, 0.1, 0.05, keep_k=32,
                             int8_input=int8_input), frame_fn
