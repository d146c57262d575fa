from tpu_se.train.optim import sgd_momentum_init, sgd_momentum_update
from tpu_se.train.step import (
    TrainHyper, TrainState, make_train_state, train_chunk, cv_forward,
    gather_splice,
)
from tpu_se.train.checkpoint import save_checkpoint, load_checkpoint
from tpu_se.train.loop import (
    TrainConfig, run_training, train_one_epoch, evaluate_cv,
    load_device_frames,
)

__all__ = [
    "sgd_momentum_init", "sgd_momentum_update",
    "TrainHyper", "TrainState", "make_train_state", "train_chunk",
    "cv_forward", "gather_splice",
    "save_checkpoint", "load_checkpoint",
    "TrainConfig", "run_training", "train_one_epoch", "evaluate_cv",
    "load_device_frames",
]
