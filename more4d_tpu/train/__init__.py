from .lora import create_lora, apply_lora, lora_param_count
from .optim import (make_adamw, came, ema_update, dynamic_clip_norm,
                    global_grad_norm, custom_mse_loss, motion_sub_loss,
                    LossOutlierTracker)
from .sampler import StratifiedTimestepSampler

__all__ = [
    "create_lora", "apply_lora", "lora_param_count",
    "make_adamw", "came", "ema_update", "dynamic_clip_norm", "global_grad_norm",
    "custom_mse_loss", "motion_sub_loss", "LossOutlierTracker",
    "StratifiedTimestepSampler",
]
