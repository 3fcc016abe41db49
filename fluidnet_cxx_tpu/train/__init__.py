from ..config import TrainConfig
from .losses import LossTerms, long_term_loss, short_term_losses
from .trainer import (
    Batch,
    TrainState,
    init_train_state,
    make_loss_fn,
    make_optimizer,
    make_train_step,
)

__all__ = [
    "LossTerms", "long_term_loss", "short_term_losses",
    "Batch", "TrainConfig", "TrainState", "init_train_state",
    "make_loss_fn", "make_optimizer", "make_train_step",
]
