from .layers import (  # noqa: F401
    BatchNorm,
    ConvNorm,
    RepVGGBlock,
    RepBlock,
    BiCModule,
    CSPSPPFModule,
    max_pool_same,
    resize_w_bilinear,
)
from .backbone import CustomBackbone, ResNetBackbone  # noqa: F401
from .neck import MultiScaleFmapModule  # noqa: F401
from .detector import AudioDetectionModel, decode_scale  # noqa: F401
from .reparam import fold_repvgg  # noqa: F401
