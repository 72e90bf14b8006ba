from .optimization import (
    make_optimizer,
    make_schedule,
    label_params,
)
from .train_state import TrainState, make_train_step

__all__ = [
    "make_optimizer",
    "make_schedule",
    "label_params",
    "TrainState",
    "make_train_step",
]
