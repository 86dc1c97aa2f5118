"""Property tests for the year-scale NCHW post-processor
(diffusion/calibrate.postprocess_long_nchw): chunked calibration equals
the one-shot NHWC call; subset-projection with a t_step=1 operator equals
projecting the full trajectory; the combined pass preserves exact
observation consistency and the trajectory dtype."""

import numpy as np
import jax.numpy as jnp
import pytest

from climate2weather_tpu.diffusion.calibrate import (
    calibrate_trajectory,
    postprocess_long_nchw,
)
from climate2weather_tpu.diffusion.guidance import SpatioTemporalCoarsening

L, H, W, C = 13, 32, 32, 2
S_STEP, T_STEP = 8, 3


@pytest.fixture(scope="module")
def traj():
    rng = np.random.RandomState(0)
    return jnp.asarray(rng.randn(L, H, W, C).astype(np.float32))


@pytest.fixture(scope="module")
def obs(traj):
    # observation from a DIFFERENT field so the projection has work to do
    rng = np.random.RandomState(1)
    other = jnp.asarray(rng.randn(L, H, W, C).astype(np.float32))
    return SpatioTemporalCoarsening(S_STEP, T_STEP)(other)


@pytest.fixture(scope="module")
def target():
    rng = np.random.RandomState(2)
    return jnp.asarray(0.5 + rng.rand(C, H // 2).astype(np.float32))


def _nchw(x_nhwc):
    return jnp.transpose(x_nhwc, (0, 3, 1, 2))


def _nhwc(x_nchw):
    return jnp.transpose(x_nchw, (0, 2, 3, 1))


def test_chunked_calibration_equals_one_shot(traj, target):
    want = calibrate_trajectory(traj, target, S_STEP)
    got = postprocess_long_nchw(
        _nchw(traj), calib_target=target, s_step=S_STEP, chunk=4
    )
    np.testing.assert_allclose(
        np.asarray(_nhwc(got)), np.asarray(want), atol=1e-4
    )


def test_subset_projection_equals_full_trajectory_projection(traj, obs):
    A = SpatioTemporalCoarsening(S_STEP, T_STEP)
    want = A.project(traj, obs, iters=3, method="spectral")
    got = postprocess_long_nchw(
        _nchw(traj), observation=obs, s_step=S_STEP, t_step=T_STEP,
        method="spectral", iters=3, chunk=2,
    )
    np.testing.assert_allclose(
        np.asarray(_nhwc(got)), np.asarray(want), atol=1e-4
    )


def test_unobserved_frames_untouched_by_projection(traj, obs):
    got = _nhwc(postprocess_long_nchw(
        _nchw(traj), observation=obs, s_step=S_STEP, t_step=T_STEP,
    ))
    unobs = [t for t in range(L) if t % T_STEP]
    np.testing.assert_allclose(
        np.asarray(got[jnp.asarray(unobs)]),
        np.asarray(traj[jnp.asarray(unobs)]),
        atol=0,
    )


def test_combined_pass_keeps_exact_observation_consistency(traj, obs, target):
    A = SpatioTemporalCoarsening(S_STEP, T_STEP)
    got = _nhwc(postprocess_long_nchw(
        _nchw(traj), calib_target=target, observation=obs,
        s_step=S_STEP, t_step=T_STEP, chunk=4,
    ))
    np.testing.assert_allclose(
        np.asarray(A(got)), np.asarray(obs), atol=1e-4
    )


def test_trajectory_dtype_preserved(traj, obs, target):
    x16 = _nchw(traj).astype(jnp.bfloat16)
    got = postprocess_long_nchw(
        x16, calib_target=target, observation=obs,
        s_step=S_STEP, t_step=T_STEP, chunk=4,
    )
    assert got.dtype == jnp.bfloat16


def test_observation_length_mismatch_raises(traj, obs):
    with pytest.raises(ValueError, match="observation has"):
        postprocess_long_nchw(
            _nchw(traj)[:7], observation=obs, s_step=S_STEP, t_step=T_STEP
        )
