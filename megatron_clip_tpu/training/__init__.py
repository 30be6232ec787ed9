from megatron_clip_tpu.training.optim import (  # noqa: F401
    make_optimizer, cosine_lr, const_lr, const_lr_cooldown)
from megatron_clip_tpu.training.train_step import make_train_step, TrainState  # noqa: F401
