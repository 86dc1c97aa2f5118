"""Modulated UNet backbone — TPU-native (NHWC, bf16 compute, fp32 params).

Capability parity with the reference UNet (model/nn.py:88-242):

- per level: a head (3x3 conv at level 0, strided 3x3 conv below), then
  ``hidden_blocks[i]`` modulated residual blocks (optionally interleaved with
  attention blocks at ``attention_levels``); additive skip connections via a
  stack, popped during ascent; tails are LayerNorm -> nearest-upsample ->
  3x3 conv (plain 3x3 conv at level 0).
- ModResidualBlock (model/nn.py:18-28): ``x + residue(x + project(emb))``
  with project = Linear(mod_features -> C) broadcast over space and
  residue = ChannelNorm -> conv -> SiLU -> conv.
- AttentionBlock (model/nn.py:31-85): single-head full self-attention over
  flattened spatial positions, sqrt(sqrt(ch)) pre-scaling and fp32 softmax.

TPU-first design decisions (deliberately not a translation):

- NHWC layout end-to-end: channels ride the 128-wide lane dimension, so
  convolutions tile directly onto the MXU and the channel-wise norm is a
  lane-local reduction.
- compute dtype is configurable (bf16 by default) while parameters stay
  fp32; normalization statistics and softmax always run in fp32.
- nearest-neighbour upsampling is a reshape-broadcast (no gather).
- channel norm is non-learnable standardization over the channel axis,
  mirroring the reference's zuko ``LayerNorm(-(spatial+1))``.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


def channel_norm(x: jnp.ndarray, eps: float = 1e-5, ddof: int = 0) -> jnp.ndarray:
    """Standardize over the channel (last) axis without learnable parameters.

    Statistics are computed in fp32 and the result is cast back to ``x.dtype``
    (reference: zuko LayerNorm used at model/nn.py:154,183).

    ``ddof=0`` (biased variance) is this framework's native mode, used by all
    checkpoints trained here.  ``ddof=1`` reproduces zuko's ``torch.var_mean``
    default (unbiased) for bit-faithful evaluation of weights imported from
    the reference's released torch snapshots
    (scripts/import_reference_snapshot.py).
    """
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.var(x32, axis=-1, keepdims=True, ddof=ddof)
    return ((x32 - mean) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


class ModResidualBlock(nn.Module):
    """``x + residue(x + project(emb))`` (reference model/nn.py:18-28,146-159).

    Works for any spatial rank: input is [B, *spatial, C].
    """

    channels: int
    kernel_size: int = 3
    spatial: int = 2
    dtype: Dtype = jnp.bfloat16
    norm_ddof: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        k = self.kernel_size
        kern = (k,) * self.spatial
        pad = [(k // 2, k // 2)] * self.spatial
        # project: Linear(mod_features -> C), broadcast over spatial dims
        proj = nn.Dense(self.channels, dtype=self.dtype, name="project")(emb)
        h = x + proj.reshape(proj.shape[0], *(1,) * self.spatial, self.channels)
        h = channel_norm(h, ddof=self.norm_ddof)
        h = nn.Conv(self.channels, kern, padding=pad, dtype=self.dtype, name="conv0")(h)
        h = nn.silu(h)
        h = nn.Conv(self.channels, kern, padding=pad, dtype=self.dtype, name="conv1")(h)
        return x + h


class AttentionBlock(nn.Module):
    """Full self-attention over flattened spatial positions.

    Single head by default; fp32 softmax with sqrt(sqrt(ch)) scaling applied
    to both q and k before the product for low-precision stability
    (reference model/nn.py:31-85).  With ``use_pallas`` and one head, the
    scores/softmax/weighted-sum run as one fused Pallas kernel
    (ops/attention.py).
    """

    channels: int
    num_heads: int = 1
    dtype: Dtype = jnp.bfloat16
    use_pallas: bool = False
    norm_ddof: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, *spatial_shape, c = x.shape
        t = int(np.prod(spatial_shape))
        h = x.reshape(b, t, c)
        h_norm = channel_norm(h, ddof=self.norm_ddof)
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(h_norm)
        if self.use_pallas and self.num_heads == 1:
            from climate2weather_tpu.ops.attention import fused_attention

            q, k, v = jnp.split(qkv, 3, axis=-1)
            out = fused_attention(q, k, v)
        else:
            qkv = qkv.reshape(b, t, 3, self.num_heads, c // self.num_heads)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [b, t, heads, ch]
            ch = c // self.num_heads
            scale = ch ** (-0.25)
            logits = jnp.einsum(
                "bthc,bshc->bhts",
                (q * scale).astype(jnp.float32),
                (k * scale).astype(jnp.float32),
            )
            weights = nn.softmax(logits, axis=-1)  # logits already fp32
            out = jnp.einsum("bhts,bshc->bthc", weights.astype(v.dtype), v)
            out = out.reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj_out")(out)
        return ((h + out)).reshape(b, *spatial_shape, c)


class NearestUpConv2x(nn.Module):
    """Fused nearest-upsample(2x) -> 3x3 conv, decomposed by output parity.

    Mathematically EXACT rewrite of ``conv3x3(nearest_upsample(x, 2))`` for
    2-D inputs: with u[p] = x[floor(p/2)], each output parity (a, b) in
    {0,1}^2 reads only a 2x2 neighbourhood of the LOW-resolution input, with
    taps that are sums of the original 3x3 taps:

        rows, a=0:  {i-1: K[0], i: K[1]+K[2]}
        rows, a=1:  {i: K[0]+K[1], i+1: K[2]}     (same for columns)

    So the op becomes four quarter-size 2x2 convs + an interleave: 16/36 of
    the original multiply-adds and no 4x-size upsampled intermediate in HBM.
    Parameters are identical to the plain conv (kernel [3,3,C,O], bias [O];
    same names), so checkpoints are interchangeable with the unfused path.

    MEASURED (ops/README.md): on the flagship model this is 1.6% SLOWER than
    XLA's plain upsample+conv (2x2 convs tile the MXU worse and the parity
    interleave materializes) — hence default OFF; kept as an exact,
    property-tested option and a record of the experiment.
    """

    out_channels: int
    dtype: Dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        C = x.shape[-1]
        O = self.out_channels
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (3, 3, C, O), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (O,), jnp.float32)
        k = kernel.astype(self.dtype)
        x = x.astype(self.dtype)

        # row-parity tap combination: [2, 3, C, O] per parity
        r0 = jnp.stack([k[0], k[1] + k[2]])          # offsets {-1, 0}
        r1 = jnp.stack([k[0] + k[1], k[2]])          # offsets {0, +1}
        # column-parity combination applied to each row-parity kernel
        def cols(kr):
            c0 = jnp.stack([kr[:, 0], kr[:, 1] + kr[:, 2]], axis=1)
            c1 = jnp.stack([kr[:, 0] + kr[:, 1], kr[:, 2]], axis=1)
            return c0, c1

        k00, k01 = cols(r0)
        k10, k11 = cols(r1)
        # padding per parity: offset {-1,0} pads before, {0,+1} pads after
        pads = {0: (1, 0), 1: (0, 1)}
        dn = jax.lax.conv_dimension_numbers(
            x.shape, (2, 2, C, O), ("NHWC", "HWIO", "NHWC")
        )

        def conv2(x_, k_, a, b):
            return jax.lax.conv_general_dilated(
                x_, k_, (1, 1), (pads[a], pads[b]), dimension_numbers=dn,
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)

        y00 = conv2(x, k00, 0, 0)
        y01 = conv2(x, k01, 0, 1)
        y10 = conv2(x, k10, 1, 0)
        y11 = conv2(x, k11, 1, 1)
        B, h, w, _ = y00.shape
        y = jnp.stack(
            [jnp.stack([y00, y01], axis=3), jnp.stack([y10, y11], axis=3)],
            axis=2,
        )  # [B, h, 2(a), w, 2(b), O]
        y = y.reshape(B, 2 * h, 2 * w, O)
        return y + bias.astype(self.dtype)


def nearest_upsample(x: jnp.ndarray, s: int, spatial: int) -> jnp.ndarray:
    """Nearest-neighbour upsample by s along every spatial dim of
    [B, *spatial, C], as reshape-broadcast (no gather)."""
    b, *sp, c = x.shape
    # interleave a broadcast axis after each spatial dim
    shape_in = [b] + [d for dim in sp for d in (dim, 1)] + [c]
    shape_bcast = [b] + [d for dim in sp for d in (dim, s)] + [c]
    x = x.reshape(shape_in)
    x = jnp.broadcast_to(x, shape_bcast)
    return x.reshape([b] + [dim * s for dim in sp] + [c])


class UNet(nn.Module):
    """Modulated N-level UNet, channels-last [B, *spatial, C], spatial
    rank 1/2/3 (reference model/nn.py:108-218 is N-d the same way).

    The production architecture is configs/sda_unet.yml: hidden_channels
    (128,128,256,384,512), 3 blocks/level, attention at level 4, 3x3 kernels,
    stride 2, SiLU.
    """

    out_channels: int
    mod_features: int
    hidden_channels: Sequence[int] = (32, 64, 128)
    hidden_blocks: Sequence[int] = (2, 3, 5)
    attention_levels: Sequence[int] = ()
    kernel_size: int = 3
    stride: int = 2
    spatial: int = 2
    dtype: Dtype = jnp.bfloat16
    use_pallas_attention: bool = False
    norm_ddof: int = 0
    # fuse nearest-upsample + tail conv by output parity (exact; 2-D stride-2
    # only — other configs fall back to the materialized upsample)
    fused_upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray) -> jnp.ndarray:
        nlev = len(self.hidden_blocks)
        k = self.kernel_size
        sd = self.spatial
        kern = (k,) * sd
        pad = [(k // 2, k // 2)] * sd
        s = self.stride
        emb = emb.astype(self.dtype)
        x = x.astype(self.dtype)
        assert x.ndim == sd + 2, (x.shape, sd)

        def level_blocks(i: int, stage: str):
            blocks = []
            for bi in range(self.hidden_blocks[i]):
                blocks.append(
                    ModResidualBlock(
                        self.hidden_channels[i],
                        kernel_size=k,
                        spatial=sd,
                        dtype=self.dtype,
                        norm_ddof=self.norm_ddof,
                        name=f"{stage}{i}_block{bi}",
                    )
                )
                if i in self.attention_levels:
                    blocks.append(
                        AttentionBlock(
                            self.hidden_channels[i],
                            dtype=self.dtype,
                            use_pallas=self.use_pallas_attention,
                            norm_ddof=self.norm_ddof,
                            name=f"{stage}{i}_attn{bi}",
                        )
                    )
            return blocks

        # ---- descent -----------------------------------------------------
        memory = []
        for i in range(nlev):
            if i == 0:
                x = nn.Conv(
                    self.hidden_channels[0], kern, padding=pad,
                    dtype=self.dtype, name="head0",
                )(x)
            else:
                x = nn.Conv(
                    self.hidden_channels[i], kern, strides=(s,) * sd, padding=pad,
                    dtype=self.dtype, name=f"head{i}",
                )(x)
            for block in level_blocks(i, "down"):
                x = block(x, emb) if isinstance(block, ModResidualBlock) else block(x)
            memory.append(x)
        memory.pop()

        # ---- ascent ------------------------------------------------------
        for i in reversed(range(nlev)):
            for block in level_blocks(i, "up"):
                x = block(x, emb) if isinstance(block, ModResidualBlock) else block(x)
            if i > 0:
                x = channel_norm(x, ddof=self.norm_ddof)
                if self.fused_upsample and sd == 2 and s == 2 and k == 3:
                    x = NearestUpConv2x(
                        self.hidden_channels[i - 1], dtype=self.dtype,
                        name=f"tail{i}",
                    )(x)
                else:
                    x = nearest_upsample(x, s, sd)
                    x = nn.Conv(
                        self.hidden_channels[i - 1], kern, padding=pad,
                        dtype=self.dtype, name=f"tail{i}",
                    )(x)
                x = x + memory.pop()
            else:
                x = nn.Conv(
                    self.out_channels, kern, padding=pad,
                    dtype=self.dtype, name="tail0",
                )(x)
        return x
