from .contrastive import (
    TrainState,
    make_train_step,
    init_train_state,
    init_sharded_train_state,
)

__all__ = [
    "TrainState",
    "make_train_step",
    "init_train_state",
    "init_sharded_train_state",
]
