"""climate2weather_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
probabilistic, spatiotemporally coherent downscaling of climate simulations.

Ground-up rebuild of the capabilities of schmidtjonathan/Climate2Weather
(score-based data assimilation with a modulated UNet eps-model), designed
TPU-first:

- NHWC layouts, bf16 compute / fp32 params, MXU-friendly convolutions
- the whole predictor-corrector sampler is one jit-compiled ``lax.scan``
- Markov-blanket window scoring runs as a chunked on-device scan
  (no host round-trips, unlike the reference's CPU<->GPU streaming)
- likelihood guidance in the production (detached) mode uses an analytic
  adjoint of the coarse-graining observation operator instead of autodiff
- data parallelism is a ``jax.sharding.Mesh`` axis; gradients are reduced
  by XLA collectives over ICI

Subpackages
-----------
- ``models``     UNet backbone + ScoreUNet wrapper (flax.linen)
- ``diffusion``  noise process, loss, PC sampler, window scoring, guidance
- ``training``   ndata-driven training loop, EMA, LR schedules, checkpoints
- ``data``       grid datasets (xarray-like), normalization, HDF5 pipeline
- ``parallel``   mesh construction and sharding helpers
- ``exp``        downscaling driver, metrics (Wasserstein/MELR/SSIM), figures
- ``ops``        Pallas TPU kernels for the hot paths
- ``utils``      config system, registries, seeding, logging
"""

__version__ = "0.1.0"

from climate2weather_tpu.utils.easydict import EasyDict  # noqa: F401
from climate2weather_tpu.utils.registry import (  # noqa: F401
    construct_class_by_name,
    call_func_by_name,
)
