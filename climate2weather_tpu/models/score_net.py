"""Score network: sinusoidal time embedding + MLP wrapped around the UNet.

Parity: reference ``ScoreUNet`` / ``timestep_embedding``
(model/score.py:14-70): 32 sinusoidal noise features -> Dense(embedding_dim)
-> SiLU -> Dense(embedding_dim) [+ Dense(forcing)] -> SiLU, modulating a
UNet with in=out channels = num_features * window (the flattened
Markov-blanket window).
"""

from __future__ import annotations

import math
from typing import Any, Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from climate2weather_tpu.models.unet import UNet
from climate2weather_tpu.utils.easydict import EasyDict
from climate2weather_tpu.utils.registry import register

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10_000.0):
    """Sinusoidal embeddings of (possibly fractional) diffusion times.

    ``t`` is reshaped to [N]; returns [N, dim] in fp32
    (reference model/score.py:14-34).
    """
    t = jnp.reshape(t, (-1,)).astype(jnp.float32)
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t[:, None] * freqs[None, :]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


@register("score_unet")
class ScoreUNet(nn.Module):
    """Eps-predicting UNet conditioned on diffusion time (and optional forcing).

    ``channels`` is the flattened window channel count (num_features * window);
    inputs/outputs are NHWC: [B, H, W, channels].
    """

    channels: int
    embedding_dim: int = 512
    noise_features: int = 32
    forcing_dim: int = 0
    hidden_channels: Sequence[int] = (32, 64, 128)
    hidden_blocks: Sequence[int] = (2, 3, 5)
    attention_levels: Sequence[int] = ()
    kernel_size: int = 3
    stride: int = 2
    spatial: int = 2
    dtype: Dtype = jnp.bfloat16
    use_pallas_attention: bool = False
    # 0 = this framework's native biased channel-norm variance; 1 = the
    # reference's zuko LayerNorm (unbiased), required when evaluating weights
    # imported from released torch snapshots
    norm_ddof: int = 0
    fused_upsample: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        t: jnp.ndarray,
        forcing: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        assert forcing is None or self.forcing_dim > 0
        emb = timestep_embedding(t, self.noise_features)
        emb = nn.Dense(self.embedding_dim, dtype=jnp.float32, name="map_layer0")(emb)
        emb = nn.silu(emb)
        emb = nn.Dense(self.embedding_dim, dtype=jnp.float32, name="map_layer1")(emb)
        if self.forcing_dim > 0 and forcing is not None:
            emb = emb + nn.Dense(
                self.embedding_dim, dtype=jnp.float32, name="map_forcing"
            )(forcing.astype(jnp.float32))
        emb = nn.silu(emb)
        # broadcast a single time embedding over the batch if needed
        if emb.shape[0] == 1 and x.shape[0] != 1:
            emb = jnp.broadcast_to(emb, (x.shape[0], emb.shape[1]))

        out = UNet(
            out_channels=self.channels,
            mod_features=self.embedding_dim,
            hidden_channels=tuple(self.hidden_channels),
            hidden_blocks=tuple(self.hidden_blocks),
            attention_levels=tuple(self.attention_levels),
            kernel_size=self.kernel_size,
            stride=self.stride,
            spatial=self.spatial,
            dtype=self.dtype,
            use_pallas_attention=self.use_pallas_attention,
            norm_ddof=self.norm_ddof,
            fused_upsample=self.fused_upsample,
            name="unet",
        )(x, emb)
        return out


def build_score_unet(
    model_cfg: dict, dtype=jnp.bfloat16, use_pallas_attention=None
) -> ScoreUNet:
    """Construct a ScoreUNet from a config dict (the sda_unet.yml surface).

    Accepted keys: channels, embedding_dim, noise_features, hidden_channels,
    hidden_blocks, attention_levels, kernel_size, forcing_dim.  Unknown torch-only keys
    (padding_mode, spatial, activation) are ignored for compatibility with
    reference YAMLs (configs/sda_unet.yml).

    ``use_pallas_attention=None`` auto-enables the fused Pallas attention
    kernel on TPU backends.
    """
    import jax

    cfg = EasyDict(model_cfg)
    if use_pallas_attention is None:
        use_pallas_attention = bool(
            cfg.get("use_pallas_attention", jax.default_backend() == "tpu")
        )
    return ScoreUNet(
        channels=int(cfg["channels"]),
        embedding_dim=int(cfg.get("embedding_dim", 512)),
        noise_features=int(cfg.get("noise_features", 32)),
        forcing_dim=int(cfg.get("forcing_dim", 0)),
        hidden_channels=tuple(cfg.get("hidden_channels", (32, 64, 128))),
        hidden_blocks=tuple(cfg.get("hidden_blocks", (2, 3, 5))),
        attention_levels=tuple(cfg.get("attention_levels", ())),
        kernel_size=int(cfg.get("kernel_size", 3)),
        stride=int(cfg.get("stride", 2)),
        spatial=int(cfg.get("spatial", 2)),
        dtype=dtype,
        use_pallas_attention=use_pallas_attention,
        norm_ddof=int(cfg.get("norm_ddof", 0)),
        fused_upsample=bool(cfg.get("fused_upsample", False)),
    )
