"""condition_on chaining surface (the reference's user API)."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    VPCosineProcess,
)
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn


def test_condition_on_equals_explicit_guidance(tiny_net, rng):
    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    k = window // 2
    L = 9
    x = jax.random.normal(rng, (L, 16, 16, C))
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    y = A(jax.random.normal(jax.random.fold_in(rng, 1), (L, 16, 16, C)))

    sf = WindowScoreFn(
        make_batched_eps_fn(net.apply), params, k, noise_process=proc
    )
    conditioned = sf.condition_on(A=A, y=y, std=0.1, gamma=1e-3, exact_grad=False)
    assert conditioned.is_conditioned
    got = conditioned(x, jnp.float32(0.5))

    guidance = GaussianGuidance(A=A, y=y, std=0.1, gamma=1e-3, exact_grad=False)
    want = guidance.guided_eps(sf, proc, x, jnp.float32(0.5))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))


def test_condition_on_requires_process(tiny_net):
    net, params, C, window = tiny_net
    sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, window // 2)
    try:
        sf.condition_on(A=None, y=None, std=0.1)
        raised = False
    except AssertionError:
        raised = True
    assert raised
