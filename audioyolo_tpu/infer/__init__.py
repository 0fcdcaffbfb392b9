from .decode import make_inference_fn, postprocess_detections  # noqa: F401
from .streaming import (  # noqa: F401
    evaluate_audio,
    evaluate_files_batched,
    quantize_clips_int8,
    rle_merge,
)
from .runner import evaluate_dir  # noqa: F401
from .eval_map import event_average_precision, event_map  # noqa: F401
from .pool import StreamWorkerPool  # noqa: F401
from .export import (  # noqa: F401
    build_serving_exported,
    load_serving_artifact,
    save_serving_artifact,
)
