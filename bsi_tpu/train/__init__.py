from .checkpoint import load_checkpoint, load_checkpoint_config, save_checkpoint
from .ema import EMAConfig, ema_decay, ema_update
from .loop import Trainer
from .optim import make_optimizer, warmup_cosine_schedule, warmup_schedule
from .state import TrainState
from .step import make_eval_step, make_sample_fn, make_train_step

__all__ = [
    "Trainer",
    "TrainState",
    "EMAConfig",
    "ema_decay",
    "ema_update",
    "make_train_step",
    "make_eval_step",
    "make_sample_fn",
    "make_optimizer",
    "warmup_schedule",
    "warmup_cosine_schedule",
    "save_checkpoint",
    "load_checkpoint",
    "load_checkpoint_config",
]
