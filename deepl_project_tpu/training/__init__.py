from .checkpoint import (latest_step, load_config, restore_checkpoint,
                         restore_params, save_checkpoint)
from .diffusion import (EMATrainState, LatentStats, encode_to_latents,
                        generate_images, generation_fid, init_ema_train_state,
                        make_dit_train_step, make_sampler,
                        rectified_flow_loss)
from .optim import make_optimizer
from .schedule import warmup_constant, warmup_cosine
from .train_step import (TrainState, init_train_state, make_eval_step,
                         make_gan_train_step, make_train_step,
                         make_vf_proj_params)

__all__ = [
    "TrainState", "init_train_state", "make_train_step", "make_eval_step",
    "make_gan_train_step", "make_vf_proj_params", "make_optimizer",
    "warmup_constant", "warmup_cosine",
    "save_checkpoint", "restore_checkpoint", "restore_params", "latest_step",
    "load_config",
    "LatentStats", "rectified_flow_loss", "make_dit_train_step",
    "make_sampler", "generate_images", "encode_to_latents", "generation_fid",
    "EMATrainState", "init_ema_train_state",
]
