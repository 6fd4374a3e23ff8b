from grit_tpu.engine.optim import (  # noqa: F401
    apply_lr,
    build_optimizer,
    cosine_lr_schedule,
    frozen_mask,
    split_param_labels,
)
from grit_tpu.engine.xe import TrainState, make_xe_train_step, make_eval_loss_step  # noqa: F401
