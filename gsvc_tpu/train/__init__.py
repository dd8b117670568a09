from gsvc_tpu.train.schedules import expon_lr
from gsvc_tpu.train.controller import TrainingController
from gsvc_tpu.train.optim import AdamState, adam_init, adam_update, build_lr_tree

__all__ = [
    "expon_lr", "TrainingController", "AdamState", "adam_init",
    "adam_update", "build_lr_tree",
]
