from .optim import make_optimizer, make_lr_schedule, build_freeze_mask, apply_mask
from .steps import ExtractConfig, make_extract_fn, make_train_step, make_eval_step
from .engine import train, do_training, do_validation, get_model_params
from . import config
