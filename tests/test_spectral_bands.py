"""Pins for the post-hoc band-restricted spectral diagnostic
(scripts/spectral_bands.py), which the unattended meso128 final eval embeds
in the verdict doc. The bands must partition the non-DC wavenumbers exactly,
and an error injected into one band must be attributed to that band only.
"""

import importlib.util
import pathlib

import numpy as np
import pytest

_SPEC = importlib.util.spec_from_file_location(
    "spectral_bands",
    pathlib.Path(__file__).resolve().parents[1] / "scripts" / "spectral_bands.py",
)
spectral_bands = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(spectral_bands)


def _wavelengths(n=65, d=6.0):
    freq = np.fft.fftfreq(2 * (n - 1), d=d)[:n]
    freq[0] = 0.0
    return 1.0 / np.maximum(freq, 1e-12)


def test_band_masks_partition_non_dc_bins():
    wl = _wavelengths()
    masks = list(spectral_bands.band_masks(wl, d=6.0, s_step=16).values())
    union = np.logical_or.reduce(masks)
    # exactly the non-DC bins, each in exactly one band
    assert union[0] == False  # noqa: E712  (DC excluded)
    assert union[1:].all()
    assert (np.sum(masks, axis=0) <= 1).all()
    # every band is non-empty at the meso128 geometry (128^2, d=6, s=16)
    assert all(m.any() for m in masks)


def test_banded_melr_attributes_error_to_the_right_band():
    wl = _wavelengths()
    masks = spectral_bands.band_masks(wl, d=6.0, s_step=16)
    gt = np.ones((3, len(wl)))  # [T, K]
    sp = np.ones((2, 3, len(wl)))  # [S, T, K]
    grid_mask = masks["grid-scale (λ<24 km)"]
    sp[..., grid_mask] = np.e  # |log| = 1 exactly, only in the finest band
    vals = {k: spectral_bands.banded_melr(sp, gt, m) for k, m in masks.items()}
    assert vals["grid-scale (λ<24 km)"] == pytest.approx(1.0)
    assert vals["obs-resolved (λ≥192 km)"] == pytest.approx(0.0)
    assert vals["generative (24≤λ<192 km)"] == pytest.approx(0.0)


def test_banded_melr_empty_band_is_nan():
    wl = _wavelengths()
    empty = np.zeros(len(wl), bool)
    assert np.isnan(spectral_bands.banded_melr(np.ones((1, 1, len(wl))), np.ones((1, len(wl))), empty))
