"""Chunked float32 fetch (bf16 bit-shift widening)."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.utils.fetch import _widen_bf16, fetch_as_float32


def test_widen_bf16_exact():
    vals = np.array([0.0, 1.0, -2.5, 3.1e-5, -7.25e8, float("inf")], np.float32)
    bf = jnp.asarray(vals).astype(jnp.bfloat16)
    widened = _widen_bf16(np.asarray(jax.device_get(bf)))
    # bf16 is f32 with a truncated mantissa: widening is exact
    np.testing.assert_array_equal(widened, np.asarray(bf.astype(jnp.float32)))


def test_fetch_chunked_matches_direct():
    rng = np.random.RandomState(0)
    x = rng.randn(37, 8, 8, 3).astype(np.float32)
    dev_f32 = jnp.asarray(x)
    dev_bf16 = dev_f32.astype(jnp.bfloat16)
    np.testing.assert_array_equal(fetch_as_float32(dev_f32, chunk_elems=500), x)
    np.testing.assert_array_equal(
        fetch_as_float32(dev_bf16, chunk_elems=500),
        np.asarray(dev_bf16.astype(jnp.float32)),
    )
