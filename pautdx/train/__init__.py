"""Training engine: optimizer factories, checkpoints, the generic Trainer."""

from pautdx.train.checkpoint import CheckpointManager  # noqa: F401
from pautdx.train.optim import (  # noqa: F401
    ReduceLROnPlateau, cosine_schedule, ema_update, label_params,
    make_optimizer, scale_updates, zero_frozen_grads,
)
from pautdx.train.trainer import TrainState, Trainer  # noqa: F401
