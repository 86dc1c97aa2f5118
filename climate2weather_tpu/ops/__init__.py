"""Pallas TPU kernels for hot operations.

Where the kernel budget goes (measured on v5e, see bench.py and ops/README.md):
the XLA-compiled UNet forward already sustains ~140 TFLOPs bf16 — equal to the
chip's measured matmul ceiling — so convolutions stay on XLA.  Pallas covers
the ops XLA cannot fuse as tightly:

- ``fused_attention``: single-kernel scores -> fp32 softmax -> weighted sum
  for the UNet's spatial self-attention (model/nn.py:31-85 semantics).
"""

from climate2weather_tpu.ops.attention import fused_attention  # noqa: F401
