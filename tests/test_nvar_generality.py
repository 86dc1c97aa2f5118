"""N-variable generality (BASELINE speaks of 6 surface variables; the COSMO
configs ship 4 — everything must be C-generic)."""

import jax
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.data.grid import GridDataset
from climate2weather_tpu.data.processing import compute_quantiles, merged_to_normed_h5
from climate2weather_tpu.diffusion import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    VPCosineProcess,
)
from climate2weather_tpu.diffusion.long_sampler import sample_guided_long
from climate2weather_tpu.diffusion.window import make_batched_eps_fn
from climate2weather_tpu.models import ScoreUNet
import pytest

SIX_VARS = ("hurs", "psl", "rsds", "tas", "uas", "vas")


def test_six_variable_pipeline(tmp_path):
    rng = np.random.RandomState(0)
    t = 24
    time = np.datetime64("2014-01-01", "ns") + np.arange(t) * np.timedelta64(1, "h")
    ds = GridDataset(
        {v: rng.randn(t, 16, 16).astype(np.float32) for v in SIX_VARS},
        {"time": time, "rlat": np.arange(16.0), "rlon": np.arange(16.0)},
    )
    ds.to_file(str(tmp_path / "m.nc"))
    compute_quantiles(ds).to_file(str(tmp_path / "q.nc"))
    out = merged_to_normed_h5(
        str(tmp_path / "m.nc"), str(tmp_path / "q.nc"), str(tmp_path / "t.h5")
    )
    import h5py

    with h5py.File(out) as f:
        assert f["x"].shape == (24, 6, 16, 16)


@pytest.mark.slow
def test_six_variable_guided_sampling(rng):
    C, window, k = 6, 3, 1
    net = ScoreUNet(
        channels=C * window,
        embedding_dim=32,
        noise_features=8,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        dtype=jnp.float32,
    )
    params = net.init(
        jax.random.PRNGKey(1), jnp.zeros((1, 16, 16, C * window)), jnp.ones((1,))
    )
    proc = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=4, t_step=3)
    L = 9
    gt = jax.random.normal(rng, (L, 16, 16, C))
    guidance = GaussianGuidance(
        A=A,
        y=A(gt),
        std=jnp.linspace(0.1, 0.4, C).reshape(1, 1, 1, C),
        gamma=7e-4,
        exact_grad=False,
    )
    noise = jax.random.normal(jax.random.fold_in(rng, 2), (L, C, 16, 16))
    x, nan = sample_guided_long(
        proc,
        make_batched_eps_fn(net.apply),
        params,
        noise,
        markov_order=k,
        chunk_size=4,
        guidance=guidance,
        steps=3,
    )
    assert not bool(nan)
    assert x.shape == (L, C, 16, 16)
    assert np.all(np.isfinite(np.asarray(x)))
