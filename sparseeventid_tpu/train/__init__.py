from .losses import (  # noqa: F401
    focal_loss,
    multi_head_accuracy,
    multi_head_loss,
    nt_xent_loss,
    nt_xent_top_k_accuracy,
    smoothed_cross_entropy,
)
from .optimizers import build_optimizer  # noqa: F401
from .schedules import build_lr_schedule, flat, one_cycle, warmup_flat_decay  # noqa: F401
from .state import TrainState, create_train_state, param_count  # noqa: F401
from .supervised import (  # noqa: F401
    make_eval_step,
    make_loss_fn,
    make_predict_step,
    make_train_step,
)
