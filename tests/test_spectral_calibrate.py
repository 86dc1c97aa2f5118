"""Climatological spectral calibration (H7, docs/fidelity/meso128/
H7_PREREG.md): annulus powers outside the observation square land on the
target; in-square bins and phases are untouched; the t=0 projection
composes without breaking either invariant."""

import h5py
import jax.numpy as jnp
import numpy as np

from climate2weather_tpu.diffusion.calibrate import (
    annulus_index_map,
    calibrate_trajectory,
    climatological_annulus_psd,
    obs_square_mask,
)
from climate2weather_tpu.diffusion.guidance import SpatioTemporalCoarsening

S, H, L, C = 8, 32, 7, 4  # s_step 8 on 32^2 -> 4x4 obs grid


def _measured_annulus_psd(x, s_step):
    """The metric-convention outside-square annulus means, numpy."""
    Lx, Hx, Wx, Cx = x.shape
    idx, n_bins = annulus_index_map(Hx, Wx)
    outside = ~obs_square_mask(Hx, Wx, s_step)
    sel = idx[outside]
    counts = np.bincount(sel, minlength=n_bins).astype(float)
    out = np.zeros((Cx, n_bins))
    for c in range(Cx):
        F = np.fft.fftshift(np.fft.fft2(x[..., c]), axes=(1, 2))
        p2 = (np.abs(F) ** 2 / (Hx * Wx))[:, outside].mean(axis=0)
        sums = np.zeros(n_bins)
        np.add.at(sums, sel, p2)
        out[c] = np.divide(sums, counts, out=np.zeros(n_bins),
                           where=counts > 0)
    return out


def _traj(seed=0, amp=5.0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(amp * rng.randn(L, H, H, C).astype(np.float32))


def _target(seed=1):
    rng = np.random.RandomState(seed)
    x = np.asarray(_traj(seed, amp=1.0))
    return jnp.asarray(_measured_annulus_psd(x, S).astype(np.float32))


def test_annulus_powers_land_on_target():
    x, tgt = _traj(amp=7.0), _target()
    xc = np.asarray(calibrate_trajectory(x, tgt, S))
    got = _measured_annulus_psd(xc, S)
    want = np.asarray(tgt)
    # per-frame matching implies the frame-mean matches too
    sel = want > 1e-12
    np.testing.assert_allclose(got[sel], want[sel], rtol=2e-3)


def test_in_square_bins_untouched():
    x, tgt = _traj(), _target()
    xc = np.asarray(calibrate_trajectory(x, tgt, S))
    sq = obs_square_mask(H, H, S)
    F0 = np.fft.fftshift(np.fft.fft2(np.asarray(x)[..., 0]), axes=(1, 2))
    F1 = np.fft.fftshift(np.fft.fft2(xc[..., 0]), axes=(1, 2))
    np.testing.assert_allclose(
        F1[:, sq], F0[:, sq], rtol=1e-4, atol=1e-3 * np.abs(F0).max()
    )


def test_phases_preserved_outside():
    x, tgt = _traj(), _target()
    xc = np.asarray(calibrate_trajectory(x, tgt, S))
    F0 = np.fft.fftshift(np.fft.fft2(np.asarray(x)[..., 1]), axes=(1, 2))
    F1 = np.fft.fftshift(np.fft.fft2(xc[..., 1]), axes=(1, 2))
    out = ~obs_square_mask(H, H, S)
    big = np.abs(F0[:, out]) > 1e-3
    ratio = (F1[:, out] / F0[:, out])[big]
    assert np.abs(np.angle(ratio)).max() < 1e-3  # pure positive gains


def test_output_is_real_and_finite():
    x, tgt = _traj(), _target()
    xc = np.asarray(calibrate_trajectory(x, tgt, S))
    assert np.isfinite(xc).all()


def test_composes_with_projection():
    A = SpatioTemporalCoarsening(s_step=S, t_step=2)
    x, tgt = _traj(), _target()
    rng = np.random.RandomState(3)
    y = jnp.asarray(rng.randn(A.out_times(L), H // S, H // S, C)
                    .astype(np.float32))
    xc = calibrate_trajectory(x, tgt, S)
    xp = A.project(xc, y, iters=3, method="spectral")
    # projection consistency holds on the calibrated field
    assert float(jnp.abs(A(xp) - y).max()) < 1e-4
    # and the projection did not disturb the calibrated annuli
    got = _measured_annulus_psd(np.asarray(xp), S)
    want = np.asarray(tgt)
    sel = want > 1e-12
    np.testing.assert_allclose(got[sel], want[sel], rtol=2e-3)


def test_climatology_from_h5(tmp_path):
    rng = np.random.RandomState(0)
    data = rng.randn(20, C, H, H).astype(np.float32)
    p = tmp_path / "train.h5"
    with h5py.File(p, "w") as f:
        f.create_dataset("x", data=data)
    tgt = climatological_annulus_psd(str(p), s_step=S, n_frames=10)
    assert tgt.shape == (C, H // 2)
    assert np.isfinite(tgt).all() and (tgt >= 0).all()
    # deterministic
    tgt2 = climatological_annulus_psd(str(p), s_step=S, n_frames=10)
    np.testing.assert_array_equal(tgt, tgt2)
