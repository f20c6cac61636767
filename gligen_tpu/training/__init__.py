from gligen_tpu.training.train_step import (  # noqa: F401
    TrainState,
    make_optimizer,
    make_train_step,
    trainable_mask,
)
