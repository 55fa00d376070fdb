from .gan import GanTrainConfig, GanTrainState, init_gan_state, make_gan_train_step
from .encoder import (
    EncoderTrainConfig,
    EncoderTrainState,
    init_encoder_state,
    make_encoder_train_step,
)
from .pti import ProjectorConfig, PtiConfig, project_w_plus, pivotal_tune
from . import losses
