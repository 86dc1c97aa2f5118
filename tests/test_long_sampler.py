"""Memory-bounded long sampler (NCHW) == straightforward sampler (NHWC)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.diffusion import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    VPCosineProcess,
)
from climate2weather_tpu.diffusion.long_sampler import (
    nchw_window_pass,
    sample_dpmpp2m_long,
    sample_guided_long,
)
from climate2weather_tpu.diffusion.sampler import sample, sample_dpmpp2m
from climate2weather_tpu.diffusion.window import WindowScoreFn, make_batched_eps_fn


def to_nchw(x):
    return jnp.moveaxis(x, 3, 1)


def to_nhwc(x):
    return np.moveaxis(np.asarray(x), 1, 3)


@pytest.fixture
def setup(tiny_net, rng):
    net, params, C, window = tiny_net
    proc = VPCosineProcess()
    k = window // 2
    L = 13
    noise = jax.random.normal(rng, (L, 16, 16, C))
    eps_fn = make_batched_eps_fn(net.apply)
    sf = WindowScoreFn(eps_fn, params, k, chunk_size=4)
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    gt = jax.random.normal(jax.random.fold_in(rng, 1), (L, 16, 16, C))
    y = A(gt)
    guidance = GaussianGuidance(
        A=A, y=y, std=jnp.asarray([0.2, 0.3]).reshape(1, 1, 1, 2),
        gamma=7e-4, exact_grad=False,
    )
    return proc, eps_fn, params, k, sf, guidance, noise


def test_nchw_window_pass_matches_window_score(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    want = sf(noise, jnp.float32(0.4))
    got = nchw_window_pass(eps_fn, params, to_nchw(noise), jnp.float32(0.4), k, 4)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), atol=2e-5)


def test_long_matches_plain_guided(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    want, nan_w = sample(
        proc, lambda x, t: guidance.guided_eps(sf, proc, x, t), noise, steps=4
    )
    got, nan_g = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan_w) and not bool(nan_g)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_long_matches_plain_unguided(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    want, _ = sample(proc, sf, noise, steps=4)
    got, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=4, frame_chunk=6,
    )
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)


@pytest.mark.slow
def test_stepwise_matches_single_scan(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    common = dict(markov_order=k, chunk_size=4, guidance=guidance, steps=5,
                  frame_chunk=5)
    want, _ = sample_guided_long(proc, eps_fn, params, to_nchw(noise), **common)
    got, nan = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise), steps_per_call=2, **common
    )
    assert not bool(nan)
    # chunking changes fusion boundaries; reverse dynamics amplify fp32
    # reassociation noise (see test_single_step_relative_match) -> loose
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    # dpm flavor
    want_d, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=5, frame_chunk=5,
    )
    got_d, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=5, frame_chunk=5,
        steps_per_call=2,
    )
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=2e-2, atol=2e-2
    )


def test_long_with_corrections_runs(setup, rng):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    got, nan = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance,
        steps=2, corrections=1, tau=0.5, rng=rng, frame_chunk=5,
    )
    assert not bool(nan)
    assert got.shape == to_nchw(noise).shape
    # variance-exact corrector noise: different amplitude -> different
    # result, same shape, still finite (formula tested analytically in
    # test_sampler.py; here just the long-tier plumbing incl. jit-cache key)
    got_ve, nan_ve = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance,
        steps=2, corrections=1, tau=0.5, corrector_variance_exact=True,
        rng=rng, frame_chunk=5,
    )
    assert not bool(nan_ve)
    assert not np.allclose(np.asarray(got_ve), np.asarray(got))


def test_dpmpp_long_matches_plain_dpmpp_unguided(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    want, _ = sample_dpmpp2m(proc, sf, noise, steps=6)
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=6, frame_chunk=5,
    )
    assert not bool(nan)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_dpmpp3m_long_matches_plain_3m_unguided(setup):
    """order=3 long form vs the short NHWC sample_dpmpp3m: same math, NCHW
    frame-chunked with one extra trajectory buffer."""
    from climate2weather_tpu.diffusion.sampler import sample_dpmpp3m

    proc, eps_fn, params, k, sf, guidance, noise = setup
    want, _ = sample_dpmpp3m(proc, sf, noise, steps=6)
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=6, frame_chunk=5,
        order=3,
    )
    assert not bool(nan)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    # stepwise drive (jit-cached chunk program) must agree with single scan
    got_s, nan_s = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=6, frame_chunk=5,
        order=3, steps_per_call=2,
    )
    assert not bool(nan_s)
    np.testing.assert_allclose(
        np.asarray(got_s), np.asarray(got), rtol=2e-2, atol=2e-2
    )


def test_dpmpp3m_long_guided_runs(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
        order=3,
    )
    assert not bool(nan)
    assert got.shape == to_nchw(noise).shape
    assert np.all(np.isfinite(np.asarray(got)))


def test_dpmpp_long_guided_runs(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan)
    assert got.shape == to_nchw(noise).shape
    assert np.all(np.isfinite(np.asarray(got)))


def test_single_step_relative_match(setup):
    proc, eps_fn, params, k, sf, guidance, noise = setup
    want, _ = sample(
        proc, lambda x, t: guidance.guided_eps(sf, proc, x, t), noise, steps=1
    )
    got, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=1, frame_chunk=5,
    )
    # values are ~1/mu(1)=1000x amplified after one step; compare relatively
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_long_exact_grad_matches_short_autodiff(setup):
    """exact_grad=True on the long path (grad through the remat'd chunked
    window scan) must match the short path's jax.grad through the full
    score function (reference src/thor/score.py:28-35 semantics)."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    from dataclasses import replace

    g_exact = replace(guidance, exact_grad=True)
    want, nan_w = sample(
        proc, lambda x, t: g_exact.guided_eps(sf, proc, x, t), noise, steps=2
    )
    got, nan_g = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=g_exact, steps=2, frame_chunk=5,
    )
    assert not bool(nan_w) and not bool(nan_g)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    # dpm flavor also accepts exact guidance
    got_d, nan_d = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=g_exact, steps=3, frame_chunk=5,
    )
    assert not bool(nan_d)
    assert np.all(np.isfinite(np.asarray(got_d)))


@pytest.mark.slow
def test_long_proc_x0_threaded(setup):
    """proc_x0 must be applied at each predictor step (reference
    src/thor/pipelines.py:41-46): clamping x0 to 0 makes the output pure
    re-noised zero-state, which differs from the unprocessed run."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    clamp = lambda x0: jnp.zeros_like(x0)
    want, _ = sample(proc, sf, noise, steps=3, proc_x0=clamp)
    got, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=3, frame_chunk=5,
        proc_x0=clamp,
    )
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    base, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=3, frame_chunk=5,
    )
    assert not np.allclose(np.asarray(got), np.asarray(base))
    # dpm flavor
    want_d, _ = sample_dpmpp2m(proc, sf, noise, steps=3, proc_x0=clamp)
    got_d, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=None, steps=3, frame_chunk=5,
        proc_x0=clamp,
    )
    np.testing.assert_allclose(to_nhwc(got_d), np.asarray(want_d), rtol=2e-2, atol=2e-2)


def test_obs_shape_mismatch_raises(setup):
    """A mis-sized external observation must be a hard error, not silent
    wrong-frame conditioning (VERDICT r1 weak-item 5)."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    from dataclasses import replace

    bad = replace(guidance, y=guidance.y[:-1])  # one obs row short
    with pytest.raises(ValueError, match="observation"):
        sample_guided_long(
            proc, eps_fn, params, to_nchw(noise),
            markov_order=k, chunk_size=4, guidance=bad, steps=1, frame_chunk=5,
        )
    with pytest.raises(ValueError, match="observation"):
        sample_dpmpp2m_long(
            proc, eps_fn, params, to_nchw(noise),
            markov_order=k, chunk_size=4, guidance=bad, steps=1, frame_chunk=5,
        )
    with pytest.raises(ValueError, match="observation"):
        sample(proc, lambda x, t: bad.guided_eps(sf, proc, x, t), noise, steps=1)


@pytest.mark.slow
def test_long_denoise_final_matches_short(setup):
    """denoise_final must apply the same guided t=0 posterior-mean pass on
    the chunked long path (both PC and DPM++) as on the short path."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    g_short = lambda x, t: guidance.guided_eps(sf, proc, x, t)
    want, nan_w = sample(proc, g_short, noise, steps=4, denoise_final=True)
    got, nan_g = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4,
        frame_chunk=5, denoise_final=True,
    )
    assert not bool(nan_w) and not bool(nan_g)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)
    # and it must actually differ from the re-noised default
    plain, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert float(jnp.abs(got - plain).max()) > 1e-5

    want_d, _ = sample_dpmpp2m(proc, g_short, noise, steps=4, denoise_final=True)
    got_d, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4,
        frame_chunk=5, denoise_final=True,
    )
    np.testing.assert_allclose(
        to_nhwc(got_d), np.asarray(want_d), rtol=2e-2, atol=2e-2
    )


@pytest.mark.slow
def test_long_denoise_final_stepwise_cached(setup):
    """Stepwise mode's cached final-denoise program must produce the same
    result as the single-scan path."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    cache = {}
    a, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4,
        frame_chunk=5, denoise_final=True,
    )
    b, _ = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4,
        frame_chunk=5, denoise_final=True, steps_per_call=2, jit_cache=cache,
    )
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert any("final" in key for key in cache)  # cached final program exists


def test_dpmpp_long_sde_eta(setup, rng):
    """SDE-DPM++(2M) in the long tier: eta=0 equals the deterministic long
    solver; eta>0 runs guided, differs, and stays finite."""
    proc, eps_fn, params, k, sf, guidance, noise = setup
    common = dict(markov_order=k, chunk_size=4, steps=5, frame_chunk=5)
    det, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise), guidance=None, **common
    )
    zero, _ = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise), guidance=None,
        sde_eta=0.0, rng=rng, **common
    )
    np.testing.assert_allclose(np.asarray(zero), np.asarray(det), rtol=1e-5,
                               atol=1e-5)
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise), guidance=guidance,
        sde_eta=1.0, rng=rng, **common
    )
    assert not bool(nan)
    assert got.shape == to_nchw(noise).shape
    assert np.isfinite(np.asarray(got)).all()
    assert not np.allclose(np.asarray(got), np.asarray(det))


def test_stepwise_resume_checkpoint(tmp_path):
    """_stepwise_drive's resume contract: a crashed run restarts from the
    last persisted carry and reproduces the uninterrupted result exactly;
    a config-digest mismatch restarts from scratch; the checkpoint file is
    removed on success."""
    import os

    from climate2weather_tpu.diffusion.long_sampler import _stepwise_drive

    xs = jnp.arange(10, dtype=jnp.float32)

    def run_chunk(carry, chunk):
        acc, nan = carry
        return (acc + jnp.sum(chunk) + 1.0, nan)

    init = (jnp.zeros((), jnp.float32), jnp.asarray(False))
    want, _ = _stepwise_drive(run_chunk, init, xs, 2, 10, False)

    # crash after 3 calls, then resume
    path = str(tmp_path / "resume.npz")
    calls = {"n": 0}

    def crashing(carry, chunk):
        calls["n"] += 1
        if calls["n"] > 3:
            raise RuntimeError("simulated wedge")
        return run_chunk(carry, chunk)

    try:
        _stepwise_drive(crashing, init, xs, 2, 10, False, ckpt=(path, 1, "cfg"))
    except RuntimeError:
        pass
    assert os.path.exists(path)
    resumed_calls = {"n": 0}

    def counting(carry, chunk):
        resumed_calls["n"] += 1
        return run_chunk(carry, chunk)

    got, _ = _stepwise_drive(counting, init, xs, 2, 10, False, ckpt=(path, 1, "cfg"))
    np.testing.assert_allclose(float(got), float(want))
    assert resumed_calls["n"] == 2  # 3 of 5 chunks were done pre-crash
    assert not os.path.exists(path)  # removed on success

    # digest mismatch -> full restart
    try:
        _stepwise_drive(crashing, init, xs, 2, 10, False, ckpt=(path, 1, "cfg"))
    except RuntimeError:
        pass
    fresh_calls = {"n": 0}

    def counting2(carry, chunk):
        fresh_calls["n"] += 1
        return run_chunk(carry, chunk)

    got2, _ = _stepwise_drive(
        counting2, init, xs, 2, 10, False, ckpt=(path, 1, "OTHER")
    )
    np.testing.assert_allclose(float(got2), float(want))
    assert fresh_calls["n"] == 5


def test_stepwise_resume_bf16_roundtrip(tmp_path):
    """bf16 carry leaves survive the uint16-view save/load."""
    from climate2weather_tpu.diffusion.long_sampler import (
        _load_carry,
        _save_carry,
    )

    path = str(tmp_path / "c.npz")
    carry = (
        jnp.linspace(-3, 7, 24, dtype=jnp.bfloat16).reshape(4, 6),
        jax.random.PRNGKey(3),
        jnp.asarray(False),
    )
    _save_carry(path, carry, 6, "dig")
    got, step = _load_carry(path, carry, "dig")
    assert step == 6
    for a, b in zip(jax.tree_util.tree_leaves(got),
                    jax.tree_util.tree_leaves(carry)):
        assert a.dtype == b.dtype
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_guided_long_resume_path_noop_on_clean_run(setup, rng, tmp_path):
    """resume_path must not change a clean run's result (it only adds
    persistence), and the file must be cleaned up."""
    import os

    proc, eps_fn, params, k, sf, guidance, noise = setup
    common = dict(markov_order=k, chunk_size=4, guidance=guidance, steps=4,
                  frame_chunk=5, steps_per_call=2)
    want, _ = sample_guided_long(proc, eps_fn, params, to_nchw(noise), **common)
    path = str(tmp_path / "r.npz")
    got, nan = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        resume_path=path, resume_every=1, **common
    )
    assert not bool(nan)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-6, atol=1e-6)
    assert not os.path.exists(path)


def test_long_matches_plain_guided_prolong(setup):
    # the NCHW chunked prolongation (jax.image.resize on [F, C, H, W]) must
    # agree with the NHWC guidance.prolong path used by the plain sampler
    import dataclasses

    proc, eps_fn, params, k, sf, guidance, noise = setup
    guidance = dataclasses.replace(guidance, prolong=True)
    want, nan_w = sample(
        proc, lambda x, t: guidance.guided_eps(sf, proc, x, t), noise, steps=4
    )
    got, nan_g = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan_w) and not bool(nan_g)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_dpmpp_long_guided_prolong_runs(setup):
    import dataclasses

    proc, eps_fn, params, k, sf, guidance, noise = setup
    guidance = dataclasses.replace(guidance, prolong=True)
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan)
    assert np.isfinite(np.asarray(got)).all()


def test_long_matches_plain_guided_anneal(setup):
    # the NCHW chunked gamma(t) release must agree with the NHWC
    # guidance.anneal path used by the plain sampler (H4)
    import dataclasses

    proc, eps_fn, params, k, sf, guidance, noise = setup
    guidance = dataclasses.replace(guidance, anneal=0.6)
    want, nan_w = sample(
        proc, lambda x, t: guidance.guided_eps(sf, proc, x, t), noise, steps=4
    )
    got, nan_g = sample_guided_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan_w) and not bool(nan_g)
    np.testing.assert_allclose(to_nhwc(got), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_dpmpp_long_guided_anneal_runs(setup):
    import dataclasses

    proc, eps_fn, params, k, sf, guidance, noise = setup
    guidance = dataclasses.replace(guidance, anneal=0.6)
    got, nan = sample_dpmpp2m_long(
        proc, eps_fn, params, to_nchw(noise),
        markov_order=k, chunk_size=4, guidance=guidance, steps=4, frame_chunk=5,
    )
    assert not bool(nan)
    assert np.isfinite(np.asarray(got)).all()
