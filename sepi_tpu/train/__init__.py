from .optim import (
    lr_schedule,
    dropout_schedule,
    build_optimizer,
    subtree_lr_factors,
)
from .trainer import (
    TrainState,
    create_train_state,
    xvec_train_step,
    am_train_step,
    xvec_eval_step,
    am_eval_step,
    make_superstep,
    Trainer,
    finalize_batch_stats,
)
from .checkpoint import save_checkpoint, load_checkpoint, combine_checkpoints
from .graft import graft_subtree

__all__ = [
    "lr_schedule",
    "dropout_schedule",
    "build_optimizer",
    "subtree_lr_factors",
    "TrainState",
    "create_train_state",
    "xvec_train_step",
    "am_train_step",
    "xvec_eval_step",
    "am_eval_step",
    "make_superstep",
    "Trainer",
    "finalize_batch_stats",
    "save_checkpoint",
    "load_checkpoint",
    "combine_checkpoints",
    "graft_subtree",
]
