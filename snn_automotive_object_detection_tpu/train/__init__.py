"""Training: optimizers, schedules, freeze masks, SPMD train/eval steps."""

from snn_automotive_object_detection_tpu.train.optim import (
    build_optimizer,
    build_schedule,
    split_trainable,
)
from snn_automotive_object_detection_tpu.train.steps import (
    make_eval_step,
    make_train_step,
)
