"""Native batch assembler vs the numpy dataset path."""

import numpy as np
import pytest

from climate2weather_tpu.data import native_loader
from climate2weather_tpu.data.dataset import InfiniteSampler, PrefetchLoader, WindowDataset


def test_native_matches_numpy(tiny_h5):
    path, x = tiny_h5  # [20, 2, 16, 16]
    ds = WindowDataset(path, num_features=2, spatial_res=16, window=5, cached=True)
    idx = np.array([0, 3, 7, 15], np.int64)
    got = native_loader.assemble_batch(ds._cache, idx, window=5, num_threads=4)
    if got is None:
        pytest.skip("no native toolchain available")
    want = np.stack([ds[int(i)] for i in idx])
    np.testing.assert_array_equal(got, want)


def test_prefetch_loader_nhwc_native(tiny_h5):
    path, x = tiny_h5
    ds = WindowDataset(path, num_features=2, spatial_res=16, window=5, cached=True)
    sampler = InfiniteSampler(len(ds), seed=3)
    loader = PrefetchLoader(
        ds, sampler, batch_size=4, rounds=2, num_threads=1, channels_first=False
    )
    batch = next(loader)
    loader.stop()
    assert batch.shape == (2, 4, 16, 16, 10)
    # first batch indices are deterministic with one loader thread
    it = iter(InfiniteSampler(len(ds), seed=3))
    idxs = [next(it) for _ in range(8)]
    want = np.stack([ds[i] for i in idxs]).reshape(2, 4, 16, 16, 10)
    np.testing.assert_array_equal(batch, want)


def test_prefetch_loader_channels_first(tiny_h5):
    """Default fast path: [rounds, B, w*C, H, W] contiguous copies; the
    device-side transpose must reproduce the NHWC items."""
    path, x = tiny_h5
    ds = WindowDataset(path, num_features=2, spatial_res=16, window=5, cached=True)
    sampler = InfiniteSampler(len(ds), seed=3)
    loader = PrefetchLoader(ds, sampler, batch_size=4, rounds=2, num_threads=1)
    batch = next(loader)
    loader.stop()
    assert batch.shape == (2, 4, 10, 16, 16)
    it = iter(InfiniteSampler(len(ds), seed=3))
    idxs = [next(it) for _ in range(8)]
    want_nhwc = np.stack([ds[i] for i in idxs]).reshape(2, 4, 16, 16, 10)
    np.testing.assert_array_equal(batch.transpose(0, 1, 3, 4, 2), want_nhwc)
