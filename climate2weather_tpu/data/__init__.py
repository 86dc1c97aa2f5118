from climate2weather_tpu.data.dataset import (  # noqa: F401
    WindowDataset,
    InfiniteSampler,
    PrefetchLoader,
)
