from .gan import GanTrainConfig, GanTrainState, init_gan_state, make_gan_train_step
