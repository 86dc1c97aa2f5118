"""N-d UNet support (spatial rank 1/2/3, reference model/nn.py is N-d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.models.unet import UNet, nearest_upsample


def test_nearest_upsample_ranks():
    x1 = jnp.arange(6, dtype=jnp.float32).reshape(1, 3, 2)
    up1 = nearest_upsample(x1, 2, 1)
    assert up1.shape == (1, 6, 2)
    np.testing.assert_array_equal(np.asarray(up1[0, :, 0]), [0, 0, 2, 2, 4, 4])

    x2 = jnp.arange(4, dtype=jnp.float32).reshape(1, 2, 2, 1)
    up2 = nearest_upsample(x2, 2, 2)
    assert up2.shape == (1, 4, 4, 1)
    np.testing.assert_array_equal(
        np.asarray(up2[0, :, :, 0]),
        [[0, 0, 1, 1], [0, 0, 1, 1], [2, 2, 3, 3], [2, 2, 3, 3]],
    )

    x3 = jnp.ones((1, 2, 2, 2, 3))
    assert nearest_upsample(x3, 2, 3).shape == (1, 4, 4, 4, 3)


@pytest.mark.slow
@pytest.mark.parametrize("spatial,shape", [(1, (2, 16, 4)), (2, (2, 16, 16, 4)), (3, (2, 8, 8, 8, 4))])
def test_unet_forward_ranks(spatial, shape):
    net = UNet(
        out_channels=4,
        mod_features=16,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        attention_levels=(1,),
        spatial=spatial,
        dtype=jnp.float32,
    )
    x = jax.random.normal(jax.random.PRNGKey(0), shape)
    emb = jax.random.normal(jax.random.PRNGKey(1), (shape[0], 16))
    params = net.init(jax.random.PRNGKey(2), x, emb)
    out = net.apply(params, x, emb)
    assert out.shape == shape
    assert np.all(np.isfinite(np.asarray(out)))
