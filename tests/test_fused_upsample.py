"""Exactness of the parity-decomposed fused upsample+conv (NearestUpConv2x).

The fused tail must equal conv3x3(nearest_upsample(x, 2)) bit-for-bit at
fp32 tolerance with IDENTICAL parameters, for any shape, including through
the full UNet (the param trees are interchangeable by construction).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.models.unet import (
    NearestUpConv2x,
    UNet,
    nearest_upsample,
)
from flax import linen as nn


@pytest.mark.parametrize("shape", [(2, 8, 8, 16), (1, 5, 7, 8), (3, 16, 16, 4)])
def test_fused_equals_upsample_then_conv(shape):
    B, H, W, C = shape
    O = 12
    x = jax.random.normal(jax.random.PRNGKey(0), shape)

    fused = NearestUpConv2x(O, dtype=jnp.float32)
    params = fused.init(jax.random.PRNGKey(1), x)

    ref_conv = nn.Conv(
        O, (3, 3), padding=[(1, 1), (1, 1)], dtype=jnp.float32
    )
    ref_params = {"params": {k: v for k, v in params["params"].items()}}
    up = nearest_upsample(x, 2, 2)
    want = ref_conv.apply(ref_params, up)
    got = fused.apply(params, x)
    assert got.shape == want.shape == (B, 2 * H, 2 * W, O)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_unet_fused_vs_unfused_same_params():
    kw = dict(
        out_channels=6,
        mod_features=16,
        hidden_channels=(8, 16, 24),
        hidden_blocks=(1, 1, 1),
        attention_levels=(2,),
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 6))
    emb = jax.random.normal(jax.random.PRNGKey(1), (2, 16))

    net_f = UNet(fused_upsample=True, **kw)
    net_u = UNet(fused_upsample=False, **kw)
    params = net_f.init(jax.random.PRNGKey(2), x, emb)
    out_f = net_f.apply(params, x, emb)
    out_u = net_u.apply(params, x, emb)  # same tree: tail params interchangeable
    np.testing.assert_allclose(
        np.asarray(out_f), np.asarray(out_u), atol=2e-5, rtol=1e-5
    )


@pytest.mark.slow
def test_gradients_flow_through_fused_path():
    net = UNet(
        out_channels=4, mod_features=8, hidden_channels=(4, 8),
        hidden_blocks=(1, 1), attention_levels=(), dtype=jnp.float32,
        fused_upsample=True,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    emb = jnp.ones((1, 8))
    params = net.init(jax.random.PRNGKey(1), x, emb)

    def loss(p):
        return jnp.sum(net.apply(p, x, emb) ** 2)

    grads = jax.grad(loss)(params)
    g = grads["params"]["tail1"]["kernel"]
    assert g.shape == (3, 3, 8, 4)
    assert float(jnp.sum(jnp.abs(g))) > 0