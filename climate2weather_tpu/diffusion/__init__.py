from climate2weather_tpu.diffusion.process import VPCosineProcess  # noqa: F401
from climate2weather_tpu.diffusion.window import (  # noqa: F401
    unfold_windows,
    fold_windows,
    WindowScoreFn,
)
from climate2weather_tpu.diffusion.guidance import (  # noqa: F401
    SpatioTemporalCoarsening,
    GaussianGuidance,
)
from climate2weather_tpu.diffusion.sampler import sample  # noqa: F401
