from .assign import assign_targets_to_scale  # noqa: F401
from .loss import AudioDetectionLoss, compute_ciou, focal_loss_with_logits  # noqa: F401
from .ema import EMAState, ema_init, ema_update  # noqa: F401
from .optim import (  # noqa: F401
    ReduceLROnPlateau,
    make_lr_schedule,
    make_optimizer,
    set_opt_learning_rate,
)
from .trainer import TrainerPipeline, TrainState  # noqa: F401
