"""Host-streaming sampler must match the on-device scan sampler."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    VPCosineProcess,
)
from climate2weather_tpu.diffusion.host_stream import (
    HostStreamingScoreFn,
    NumpyCoarsening,
    sample_host,
)
from climate2weather_tpu.diffusion.sampler import sample as device_sample
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn


def test_host_score_matches_device(tiny_net, rng):
    net, params, C, window = tiny_net
    k = window // 2
    L = 11
    x = np.asarray(jax.random.normal(rng, (L, 16, 16, C)), np.float32)
    dev = WindowScoreFn(make_batched_eps_fn(net.apply), params, k, chunk_size=3)
    host = HostStreamingScoreFn(net.apply, params, k, batch_size=3)
    e_dev = np.asarray(dev(jnp.asarray(x), jnp.float32(0.4)))
    e_host = host(x, 0.4)
    np.testing.assert_allclose(e_host, e_dev, atol=3e-5)


def test_host_sampler_matches_device_unguided(tiny_net, rng):
    net, params, C, window = tiny_net
    k = window // 2
    proc = VPCosineProcess()
    L = 9
    noise = np.asarray(jax.random.normal(rng, (L, 16, 16, C)), np.float32)
    dev_sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
    want, nan = device_sample(proc, dev_sf, jnp.asarray(noise), steps=4)
    assert not bool(nan)
    host_sf = HostStreamingScoreFn(net.apply, params, k, batch_size=4)
    got = sample_host(proc, host_sf, noise, steps=4)
    # The reverse dynamics amplify ~1000x at t=1 (1/mu), so fp32
    # reassociation between lax.scan and the numpy loop compounds; per-step
    # eps agreement is ~1e-6 (see test_host_score_matches_device) and the
    # trajectory-level check is necessarily loose.
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-2, atol=5e-2)


def test_host_sampler_matches_device_guided(tiny_net, rng):
    net, params, C, window = tiny_net
    k = window // 2
    proc = VPCosineProcess()
    L = 9
    noise = np.asarray(jax.random.normal(rng, (L, 16, 16, C)), np.float32)
    gt = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 1), (L, 16, 16, C)), np.float32
    )
    A_np = NumpyCoarsening(s_step=4, t_step=3)
    A_dev = SpatioTemporalCoarsening(s_step=4, t_step=3)
    y = A_np(gt)
    std = np.asarray([0.2, 0.3], np.float32).reshape(1, 1, 1, 2)

    dev_sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
    guidance = GaussianGuidance(
        A=A_dev, y=jnp.asarray(y), std=jnp.asarray(std), gamma=7e-4, exact_grad=False
    )
    want, nan = device_sample(
        proc,
        lambda x, t: guidance.guided_eps(dev_sf, proc, x, t),
        jnp.asarray(noise),
        steps=4,
    )
    assert not bool(nan)

    host_sf = HostStreamingScoreFn(net.apply, params, k, batch_size=4)
    got = sample_host(
        proc,
        host_sf,
        noise,
        steps=4,
        guidance_A=A_np,
        guidance_y=y,
        guidance_std=std,
        guidance_gamma=7e-4,
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-2, atol=5e-2)


def test_host_denoise_final_point_mass():
    """Exact point-mass score: default keeps the sigma(0)=eta residual,
    denoise_final returns exactly the point (see test_sampler.py)."""
    from climate2weather_tpu.diffusion import VPCosineProcess
    from climate2weather_tpu.diffusion.host_stream import sample_host

    proc = VPCosineProcess()
    c = -0.42

    def score_fn(x, t):
        mu = float(proc.mu(t))
        sigma = float(proc.sigma(t))
        return ((x - mu * c) / sigma).astype(np.float32)

    noise = np.random.RandomState(0).randn(3, 4, 4, 2).astype(np.float32)
    plain = sample_host(proc, score_fn, noise, steps=16)
    den = sample_host(proc, score_fn, noise, steps=16, denoise_final=True)
    assert np.abs(den - c).max() < 1e-5
    assert np.abs(den - c).max() < 1e-2 * np.abs(plain - c).max()


def test_host_dpm_matches_device_unguided(tiny_net, rng):
    from climate2weather_tpu.diffusion.host_stream import sample_host_dpm
    from climate2weather_tpu.diffusion.sampler import sample_dpmpp2m

    net, params, C, window = tiny_net
    k = window // 2
    proc = VPCosineProcess()
    L = 9
    noise = np.asarray(jax.random.normal(rng, (L, 16, 16, C)), np.float32)
    dev_sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
    want, nan = sample_dpmpp2m(proc, dev_sf, jnp.asarray(noise), steps=6)
    assert not bool(nan)
    host_sf = HostStreamingScoreFn(net.apply, params, k, batch_size=4)
    got = sample_host_dpm(proc, host_sf, noise, steps=6, frame_slab=4)
    # fp32 reassociation noise amplified by the reverse dynamics (see the
    # PC parity test above); tolerance scaled to the field magnitude
    scale = float(np.std(np.asarray(want)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-2,
                               atol=5e-3 * scale)


def test_host_dpm_matches_device_guided(tiny_net, rng):
    from climate2weather_tpu.diffusion.host_stream import sample_host_dpm
    from climate2weather_tpu.diffusion.sampler import sample_dpmpp2m

    net, params, C, window = tiny_net
    k = window // 2
    proc = VPCosineProcess()
    L = 9
    noise = np.asarray(jax.random.normal(rng, (L, 16, 16, C)), np.float32)
    gt = np.asarray(
        jax.random.normal(jax.random.fold_in(rng, 1), (L, 16, 16, C)), np.float32
    )
    A_np = NumpyCoarsening(s_step=4, t_step=3)
    A_dev = SpatioTemporalCoarsening(s_step=4, t_step=3)
    y = A_np(gt)
    std = np.asarray([0.2, 0.3], np.float32).reshape(1, 1, 1, 2)
    dev_sf = WindowScoreFn(make_batched_eps_fn(net.apply), params, k)
    guidance = GaussianGuidance(
        A=A_dev, y=jnp.asarray(y), std=jnp.asarray(std), gamma=7e-4,
        exact_grad=False,
    )
    want, nan = sample_dpmpp2m(
        proc,
        lambda x, t: guidance.guided_eps(dev_sf, proc, x, t),
        jnp.asarray(noise),
        steps=6,
    )
    assert not bool(nan)
    host_sf = HostStreamingScoreFn(net.apply, params, k, batch_size=4)
    got = sample_host_dpm(
        proc, host_sf, noise, steps=6, frame_slab=4,
        guidance_A=A_np, guidance_y=y, guidance_std=std, guidance_gamma=7e-4,
    )
    scale = float(np.std(np.asarray(want)))
    np.testing.assert_allclose(got, np.asarray(want), rtol=5e-2,
                               atol=5e-3 * scale)


def test_host_dpm_sde_runs_and_differs(tiny_net, rng):
    from climate2weather_tpu.diffusion.host_stream import sample_host_dpm

    net, params, C, window = tiny_net
    k = window // 2
    proc = VPCosineProcess()
    noise = np.asarray(jax.random.normal(rng, (9, 16, 16, C)), np.float32)
    host_sf = HostStreamingScoreFn(net.apply, params, k, batch_size=4)
    det = sample_host_dpm(proc, host_sf, noise, steps=4, frame_slab=4)
    sde = sample_host_dpm(
        proc, host_sf, noise, steps=4, frame_slab=4, sde_eta=1.0, seed=5
    )
    sde2 = sample_host_dpm(
        proc, host_sf, noise, steps=4, frame_slab=4, sde_eta=1.0, seed=5
    )
    assert np.isfinite(sde).all()
    np.testing.assert_allclose(sde, sde2)  # seeded -> reproducible
    assert not np.allclose(sde, det)
