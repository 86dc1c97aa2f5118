"""steprules: in-place numpy variants must match the allocating formulas,
and PrefetchLoader must surface worker failures instead of deadlocking."""

import numpy as np
import pytest

from climate2weather_tpu.diffusion import steprules


def test_ddim_step_inplace_matches():
    r = np.random.RandomState(0)
    x = r.standard_normal((5, 8, 8, 2)).astype(np.float32)
    eps = r.standard_normal(x.shape).astype(np.float32)
    mu, sigma, mu2, sigma2 = 0.9, 0.44, 0.95, 0.31
    want = steprules.ddim_step(x.copy(), eps.copy(), mu, sigma, mu2, sigma2)
    got = steprules.ddim_step_inplace(x.copy(), eps.copy(), mu, sigma, mu2, sigma2)
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_ddim_step_inplace_proc_x0_matches():
    r = np.random.RandomState(1)
    x = r.standard_normal((4, 6, 6, 3)).astype(np.float32)
    eps = r.standard_normal(x.shape).astype(np.float32)
    mu, sigma, mu2, sigma2 = 0.7, 0.7, 0.8, 0.6

    def clip(x0):
        return np.clip(x0, -1.0, 1.0)

    want = steprules.ddim_step(
        x.copy(), eps.copy(), mu, sigma, mu2, sigma2, proc_x0=clip
    )
    got = steprules.ddim_step_inplace(
        x.copy(), eps.copy(), mu, sigma, mu2, sigma2, proc_x0=clip
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)

    # an in-place proc_x0 (returns its argument) must also work
    def clip_inplace(x0):
        np.clip(x0, -1.0, 1.0, out=x0)
        return x0

    got2 = steprules.ddim_step_inplace(
        x.copy(), eps.copy(), mu, sigma, mu2, sigma2, proc_x0=clip_inplace
    )
    np.testing.assert_allclose(got2, np.asarray(want), rtol=1e-5, atol=1e-6)


def test_langevin_step_inplace_matches():
    r = np.random.RandomState(2)
    x = r.standard_normal((3, 8, 8, 2)).astype(np.float32)
    eps = r.standard_normal(x.shape).astype(np.float32)
    z = r.standard_normal(x.shape).astype(np.float32)
    delta, sigma2 = 0.37, 0.52
    want = steprules.langevin_step(x.copy(), eps.copy(), z.copy(), delta, sigma2)
    got = steprules.langevin_step_inplace(
        x.copy(), eps.copy(), z.copy(), delta, sigma2
    )
    np.testing.assert_allclose(got, np.asarray(want), rtol=1e-5, atol=1e-6)


# ---- PrefetchLoader failure semantics ---------------------------------------


class _BoomDataset:
    """dataset[i] raises for one index; everything else returns data."""

    def __init__(self, bad=5):
        self.bad = bad

    def __len__(self):
        return 16

    def __getitem__(self, i):
        if i == self.bad:
            raise OSError("simulated transient HDF5 read failure")
        return np.full((2, 4, 4), float(i), np.float32)


def test_prefetch_loader_worker_error_raises_not_hangs():
    from climate2weather_tpu.data.dataset import PrefetchLoader

    loader = PrefetchLoader(
        _BoomDataset(bad=2),
        iter(range(16)),
        batch_size=2,
        rounds=1,
        num_threads=2,
        channels_first=False,
    )
    with pytest.raises(RuntimeError, match="worker failed"):
        for _ in range(8):  # the bad index is in the second batch
            next(loader)
    loader.stop()


def test_prefetch_loader_finite_iterator_stops():
    from climate2weather_tpu.data.dataset import PrefetchLoader

    loader = PrefetchLoader(
        _BoomDataset(bad=99),
        iter(range(8)),  # exactly 4 batches of 2
        batch_size=2,
        rounds=1,
        num_threads=2,
        channels_first=False,
    )
    got = list(loader)
    loader.stop()
    assert len(got) == 4
    # ticket order is preserved: batch j holds indices (2j, 2j+1)
    for j, b in enumerate(got):
        np.testing.assert_array_equal(b[0, 0], np.full((2, 4, 4), 2 * j))
