from climate2weather_tpu.training.ema import ema_init, ema_update  # noqa: F401
from climate2weather_tpu.training.lr import (  # noqa: F401
    linear_learning_rate_schedule,
    edm2_learning_rate_schedule,
)
from climate2weather_tpu.training.state import TrainState, make_train_step  # noqa: F401
from climate2weather_tpu.training.checkpoint import CheckpointIO, save_snapshot, load_snapshot  # noqa: F401
