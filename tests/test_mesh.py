"""Mesh construction and sharding helpers on the 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.parallel.mesh import (
    DATA_AXIS,
    WINDOW_AXIS,
    batch_sharding,
    make_mesh,
    replicated,
    shard_batch,
    window_sharding,
)


def test_make_mesh_shapes():
    m = make_mesh()
    assert m.devices.size == 8
    assert m.axis_names == (DATA_AXIS, WINDOW_AXIS, "model")
    m2 = make_mesh(data=4, window=2)
    assert m2.devices.shape == (4, 2, 1)
    with pytest.raises(AssertionError):
        make_mesh(data=3, window=2)  # 6 != 8


def test_shard_batch_layout():
    m = make_mesh(data=4, window=2)
    x = np.arange(8 * 2 * 3 * 4, dtype=np.float32).reshape(2, 8, 3, 4)
    arr = shard_batch(x, m)  # [rounds, B, ...] with B sharded over 8 devices
    assert arr.sharding.spec == jax.sharding.PartitionSpec(
        None, (DATA_AXIS, WINDOW_AXIS)
    )
    # each device holds B/8 = 1 row of the batch axis
    shard_shapes = {s.data.shape for s in arr.addressable_shards}
    assert shard_shapes == {(2, 1, 3, 4)}
    np.testing.assert_array_equal(np.asarray(arr), x)


def test_gradient_allreduce_over_mesh():
    """A jitted mean-loss grad over a sharded batch must equal the
    single-device result (XLA inserts the psum)."""
    m = make_mesh()
    w = jnp.asarray([[2.0], [1.0]])

    def loss(w, x):
        return jnp.mean((x @ w) ** 2)

    x = np.random.RandomState(0).randn(16, 2).astype(np.float32)
    g_ref = jax.grad(loss)(w, jnp.asarray(x))
    xs = jax.device_put(
        x, jax.sharding.NamedSharding(m, jax.sharding.PartitionSpec((DATA_AXIS, WINDOW_AXIS)))
    )
    g_sharded = jax.jit(
        jax.grad(loss),
        in_shardings=(replicated(m), xs.sharding),
        out_shardings=replicated(m),
    )(jax.device_put(w, replicated(m)), xs)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_ref), rtol=1e-6)


def test_window_sharding_spec():
    m = make_mesh()
    ws = window_sharding(m)
    assert ws.spec == jax.sharding.PartitionSpec((DATA_AXIS, WINDOW_AXIS))
    bs = batch_sharding(m, leading_none=2)
    assert bs.spec == jax.sharding.PartitionSpec(None, None, (DATA_AXIS, WINDOW_AXIS))


def test_sharded_window_score_matches_unsharded(tiny_net):
    """Sequence-parallel window evaluation over the 8-device mesh must be
    numerically identical to the single-device path."""
    import jax.numpy as jnp

    from climate2weather_tpu.diffusion.window import (
        WindowScoreFn,
        make_batched_eps_fn,
    )

    net, params, C, window = tiny_net
    k = window // 2
    m = make_mesh()
    L = 19  # 15 windows, chunk 8 -> 2 chunks sharded over 8 devices
    x = jax.random.normal(jax.random.PRNGKey(5), (L, 16, 16, C))
    eps_fn = make_batched_eps_fn(net.apply)
    plain = WindowScoreFn(eps_fn, params, k, chunk_size=8)
    sharded = WindowScoreFn(
        eps_fn, params, k, chunk_size=8, window_sharding=window_sharding(m)
    )
    want = jax.jit(lambda p, xx: plain(xx, jnp.float32(0.3)))(params, x)
    got = jax.jit(lambda p, xx: sharded(xx, jnp.float32(0.3)))(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)
