from .resample import Resampler, sinc_resample_kernel  # noqa: F401
from .frontend import (  # noqa: F401
    SpectralFrontend,
    amplitude_to_db,
    dct_matrix,
    hann_window,
    mel_filterbank,
    standardize_per_channel,
    stft_power,
)
from .nms import batched_interval_nms, interval_iou_matrix  # noqa: F401
from .kmeans import kmeans_1d  # noqa: F401
from .metrics import masked_classification_metrics  # noqa: F401
