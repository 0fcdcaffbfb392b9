"""audioyolo_tpu — a TPU-native (JAX/XLA/Pallas) audio activity detection framework.

Detects ``(start, end, class)`` event intervals in long-form audio by treating the
problem as 1-D YOLO object detection over stacked log-mel + MFCC spectrogram
"images", following the capabilities of the reference system
``ches-001/YOLO-inspired-audio-activity-detection`` (see SURVEY.md) while being
designed TPU-first:

- the DSP frontend (resample -> STFT -> mel -> dB -> MFCC) is expressed as a
  chain of GEMMs feeding the MXU (ops/frontend.py, ops/resample.py);
- the model is a pure ``(params, x) -> (sm, md, lg)`` function over NHWC
  tensors with static shapes (models/);
- RepVGG structural re-parameterization is a functional pytree->pytree fold,
  applied at weight-load time (models/reparam.py);
- target assignment / loss / NMS are fixed-capacity masked-tensor computations
  living inside one jitted graph (train/assign.py, train/loss.py, ops/nms.py);
- scaling is data-parallel over an ICI mesh via ``jax.sharding`` (parallel/).
"""

__version__ = "0.1.0"

from .config import load_config, Config  # noqa: F401
