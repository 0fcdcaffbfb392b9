from .wavio import read_wav, read_wav_info, write_wav  # noqa: F401
from .dataset import AudioDataset, AudioConcatDataset  # noqa: F401
from .loader import BatchLoader  # noqa: F401
