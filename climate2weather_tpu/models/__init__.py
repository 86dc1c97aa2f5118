from climate2weather_tpu.models.unet import UNet, channel_norm  # noqa: F401
from climate2weather_tpu.models.score_net import (  # noqa: F401
    ScoreUNet,
    timestep_embedding,
    build_score_unet,
)
