from novic_tpu.train.step import TrainState, make_train_step  # noqa: F401
from novic_tpu.train.optim import create_optimizer, lr_schedule_per_chunk  # noqa: F401
