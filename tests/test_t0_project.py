"""t=0 data-consistency projection (H6, docs/fidelity/meso128/H6_PREREG.md).

Properties pinned here (SpatioTemporalCoarsening.project,
diffusion/guidance.py):

1. exact consistency — A(project(x, y)) == y to float32 round-off, for the
   block right-inverse (one pass) AND the band-limited Richardson methods
   (3 passes);
2. band limitation — the spectral correction adds NO power above the coarse
   grid's representable band (the whole point vs the block staircase);
3. locality in time — unobserved frames (t % t_step != 0) are bit-unchanged;
4. idempotence — projecting a consistent trajectory is a no-op (residual 0).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.diffusion.guidance import SpatioTemporalCoarsening


def _setup(L=13, H=32, W=32, C=4, s=8, t=6, seed=0):
    rng = np.random.RandomState(seed)
    A = SpatioTemporalCoarsening(s_step=s, t_step=t)
    x = jnp.asarray(rng.randn(L, H, W, C).astype(np.float32))
    y = jnp.asarray(rng.randn(A.out_times(L), H // s, W // s, C).astype(np.float32))
    return A, x, y


@pytest.mark.parametrize("method,iters,tol", [
    ("block", 1, 1e-5),
    ("spectral", 3, 1e-4),
])
def test_exact_consistency(method, iters, tol):
    A, x, y = _setup()
    xp = A.project(x, y, iters=iters, method=method)
    err = np.asarray(jnp.abs(A(xp) - y)).max()
    assert err < tol, (method, err)


def test_nyquist_polish_contracts():
    """The direct Dirichlet-gain solve is exact except for the
    self-conjugate Nyquist bins; each polish pass shrinks that residual."""
    A, x, y = _setup()
    errs = []
    for i in (1, 2, 3):
        xp = A.project(x, y, iters=i, method="spectral")
        errs.append(float(np.asarray(jnp.abs(A(xp) - y)).max()))
    assert errs[0] < 0.2, errs  # one pass already near-exact
    assert errs[1] < errs[0] and errs[2] <= errs[1], errs


def test_spectral_correction_is_band_limited():
    """No power added above the coarse band: fine-grid FFT coefficients of
    (project(x) - x) outside the centered (h+1) x (w+1) block — BOTH ±h/2
    Nyquist edges, since a real field splits the self-conjugate coarse
    Nyquist mode symmetrically — are ~0 at observed frames."""
    A, x, y = _setup()
    xp = A.project(x, y, iters=3, method="spectral")
    delta = np.asarray(xp - x)[:: A.t_step]  # observed frames only
    spec = np.fft.fftshift(np.fft.fft2(delta, axes=(1, 2)), axes=(1, 2))
    Hf, Wf = delta.shape[1], delta.shape[2]
    h, w = Hf // A.s_step, Wf // A.s_step
    y0, x0 = (Hf - h) // 2, (Wf - w) // 2
    mask = np.ones((Hf, Wf), bool)
    mask[y0 : y0 + h + 1, x0 : x0 + w + 1] = False
    out_band = np.abs(spec[:, mask, :])
    in_band = np.abs(spec[:, ~mask, :])
    assert out_band.max() < 1e-3 * max(in_band.max(), 1.0), (
        out_band.max(), in_band.max())


def test_block_injects_above_band_spectral_does_not():
    """The staircase right-inverse leaks real power past the coarse band —
    the aliasing H2 measured — while the spectral projection does not."""
    A, x, y = _setup()
    d_block = np.asarray(A.project(x, y, method="block") - x)[:: A.t_step]
    spec = np.fft.fftshift(np.fft.fft2(d_block, axes=(1, 2)), axes=(1, 2))
    Hf, Wf = d_block.shape[1], d_block.shape[2]
    h, w = Hf // A.s_step, Wf // A.s_step
    y0, x0 = (Hf - h) // 2, (Wf - w) // 2
    mask = np.ones((Hf, Wf), bool)
    mask[y0 : y0 + h + 1, x0 : x0 + w + 1] = False
    assert np.abs(spec[:, mask, :]).max() > 1.0  # staircase harmonics


def test_unobserved_frames_unchanged():
    A, x, y = _setup()
    for method in ("block", "spectral"):
        xp = np.asarray(A.project(x, y, iters=3, method=method))
        xn = np.asarray(x)
        unobs = [i for i in range(x.shape[0]) if i % A.t_step != 0]
        np.testing.assert_array_equal(xp[unobs], xn[unobs])


def test_idempotent_on_consistent_input():
    A, x, y = _setup()
    xp = A.project(x, y, iters=3, method="spectral")
    xpp = A.project(xp, y, iters=3, method="spectral")
    np.testing.assert_allclose(np.asarray(xpp), np.asarray(xp), atol=2e-5)
