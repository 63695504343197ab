from .checkpoints import (restore_checkpoint, restore_params_only,
                          save_checkpoint, save_params_only)
from .loop import make_eval_step, make_loss_fn, make_train_step
from .state import (TrainState, build_optimizer, cosine_warm_restarts,
                    create_train_state, current_lr)
from .trainer import ModernBrainTumorTrainer

__all__ = [
    "restore_checkpoint", "restore_params_only", "save_checkpoint",
    "save_params_only", "make_eval_step", "make_loss_fn",
    "make_train_step", "TrainState", "build_optimizer",
    "cosine_warm_restarts", "create_train_state", "current_lr",
    "ModernBrainTumorTrainer",
]
