"""Climatological spectral calibration (H7, docs/fidelity/meso128/H7_PREREG.md).

H6 measured the production model's core amplitude defect: its samples are
absolutely over-amplitude (3-6x per channel), with ~70x truth's fine-band
power, yet every shape-normalized/standardized gating metric hid it. This
module rescales each sample's radial-annulus Fourier amplitudes OUTSIDE the
observation band to the TRAINING SET's climatological annulus power — a
statistics-only post-process in the family of quantile mapping / spectral
nudging used in operational downscaling:

- the calibration target comes from the training year only (train_normed.h5;
  the eval window's truth is never touched);
- phases — i.e. where the weather is — are untouched: only per-annulus
  amplitude gains are applied;
- bins inside the centered (h+1) x (w+1) observation square are untouched,
  so the t=0 data-consistency projection (guidance.py project) composes
  exactly: projection owns the observed band, calibration owns the bands
  the observation cannot constrain.

The annulus map matches exp/metrics.rapsd bit-for-bit (round(shifted
radius), n_bins = H//2, corner bins clamped into the outermost annulus) so
a calibrated field's measured RAPSD lands on the target by construction.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def annulus_index_map(H: int, W: int):
    """[H, W] int32 annulus ids on the fftshift'd grid, matching
    exp/metrics.rapsd: bin i collects radius in [i-0.5, i+0.5); ids are
    clamped to n_bins-1 so the corner bins (radius > H//2) follow the
    outermost measured annulus."""
    yc, xc = H // 2, W // 2
    yy, xx = np.indices((H, W))
    r = np.sqrt((yy - yc) ** 2 + (xx - xc) ** 2)
    n_bins = H // 2
    return np.minimum(np.round(r).astype(np.int32), n_bins - 1), n_bins


def obs_square_mask(H: int, W: int, s_step: int):
    """[H, W] bool: True on the centered (h+1) x (w+1) observation-band
    square (h = H//s_step) — the bins the t=0 projection owns, including
    both ±Nyquist edges (a real field splits the self-conjugate coarse
    Nyquist mode symmetrically; see tests/test_t0_project.py)."""
    h, w = H // s_step, W // s_step
    y0, x0 = (H - h) // 2, (W - w) // 2
    m = np.zeros((H, W), bool)
    m[y0 : y0 + h + 1, x0 : x0 + w + 1] = True
    return m


def climatological_annulus_psd(
    h5_path: str,
    s_step: int = 16,
    n_frames: int = 256,
) -> np.ndarray:
    """[C, n_bins] climatological annulus-mean PSD of the (normalized)
    training data, outside-square bins only, deterministic frame stride."""
    import h5py

    with h5py.File(h5_path, "r") as f:
        x = f["x"]  # [T, C, H, W] float32, normalized
        T, C, H, W = x.shape
        take = np.unique(
            np.linspace(0, T - 1, min(n_frames, T)).round().astype(int)
        )
        frames = x[take]  # [F, C, H, W]
    idx, n_bins = annulus_index_map(H, W)
    outside = ~obs_square_mask(H, W, s_step)
    sel = idx[outside]
    counts = np.bincount(sel, minlength=n_bins).astype(np.float64)
    out = np.zeros((C, n_bins), np.float64)
    for c in range(C):
        F = np.fft.fftshift(
            np.fft.fft2(frames[:, c].astype(np.float64)), axes=(1, 2)
        )
        p2 = (np.abs(F) ** 2 / (H * W))[:, outside]  # [F, n_outside]
        sums = np.zeros(n_bins, np.float64)
        np.add.at(sums, sel, p2.mean(axis=0))
        out[c] = np.divide(sums, counts, out=np.zeros(n_bins),
                           where=counts > 0)
    return out.astype(np.float32)


def calibrate_trajectory(
    x: jnp.ndarray,
    target: jnp.ndarray,
    s_step: int,
    max_gain: float = 10.0,
) -> jnp.ndarray:
    """Rescale x's ([L, H, W, C], NHWC) per-annulus spectral power outside
    the observation square to ``target`` ([C, n_bins]); phases and
    in-square bins untouched. jit/vmap-safe (static shapes only).

    ``max_gain`` caps per-annulus amplification: calibration is meant to
    TAME an over-powered spectrum (at the production working point every
    gain is < 1 — H6 measured ~70x fine-band excess); an annulus where the
    sample has near-zero power would otherwise be amplified unboundedly
    into pure noise."""
    L, H, W, C = x.shape
    idx_np, n_bins = annulus_index_map(H, W)
    outside_np = ~obs_square_mask(H, W, s_step)
    # one-hot annulus matrix over outside bins: [n_bins, H*W]
    onehot = np.zeros((n_bins, H * W), np.float32)
    onehot[idx_np.ravel(), np.arange(H * W)] = outside_np.ravel()
    counts = onehot.sum(axis=1)  # outside bins per annulus
    onehot_n = onehot / np.maximum(counts, 1.0)[:, None]
    M = jnp.asarray(onehot_n)
    outside = jnp.asarray(outside_np)
    idx = jnp.asarray(idx_np)

    Fs = jnp.fft.fftshift(
        jnp.fft.fft2(x.astype(jnp.float32), axes=(1, 2)), axes=(1, 2)
    )
    p2 = jnp.abs(Fs) ** 2 / jnp.float32(H * W)  # [L, H, W, C]
    # annulus means over outside bins: [L, C, n_bins]
    p_a = jnp.einsum("bhw,lhwc->lcb", M.reshape(n_bins, H, W), p2)
    scale_a = jnp.minimum(
        jnp.sqrt(
            jnp.asarray(target, jnp.float32)[None] / jnp.maximum(p_a, 1e-20)
        ),
        jnp.float32(max_gain),
    )  # [L, C, n_bins]
    per_bin = scale_a[:, :, idx]  # [L, C, H, W]
    gain = jnp.where(
        outside[None, :, :, None], per_bin.transpose(0, 2, 3, 1), 1.0
    )
    out = jnp.fft.ifft2(
        jnp.fft.ifftshift(Fs * gain, axes=(1, 2)), axes=(1, 2)
    ).real
    return out.astype(x.dtype)


def postprocess_long_nchw(
    x: jnp.ndarray,
    calib_target=None,
    s_step: int = 16,
    observation=None,
    t_step: int = 6,
    method: str = "spectral",
    iters: int = 3,
    chunk: int = 512,
) -> jnp.ndarray:
    """Year-scale t=0 post-processing for NCHW long-sampler trajectories,
    in the short-path order (exp/downscaling.py _sample_impl):
    climatological calibration first, then data-consistency projection.

    Both post-processes are per-frame spatial operators, so a trajectory
    too long for one FFT pass (a year = 8737 frames; the full-trajectory
    complex64 spectrum alone is ~4.6 GB) is processed in time chunks:

    - calibration touches every frame — chunked jitted map over
      [chunk, H, W, C] slices;
    - projection (guidance.SpatioTemporalCoarsening.project) only
      constrains frames at ``::t_step`` (A subsamples time before pooling),
      so it runs on the gathered observed-frame subset with a t_step=1
      operator and scatters back — exactly equal to projecting the full
      trajectory (property test: tests/test_long_post.py).

    Chunks compute at fp32 and cast back to the trajectory dtype (bf16 at
    year scale). ``observation`` is the NHWC [lo, h, w, C] device array;
    pass None to skip projection (unconditional runs calibrate only).
    """
    import jax

    L = x.shape[0]
    if calib_target is not None:
        target = jnp.asarray(calib_target)

        @jax.jit
        def _cal(c_nchw):
            nhwc = jnp.transpose(c_nchw, (0, 2, 3, 1))
            out = calibrate_trajectory(nhwc, target, s_step)
            return jnp.transpose(out, (0, 3, 1, 2)).astype(c_nchw.dtype)

        x = jnp.concatenate(
            [_cal(x[i : i + chunk]) for i in range(0, L, chunk)], axis=0
        )

    if observation is not None and method:
        from climate2weather_tpu.diffusion.guidance import (
            SpatioTemporalCoarsening,
        )

        A1 = SpatioTemporalCoarsening(s_step=s_step, t_step=1)
        idx = np.arange(0, L, t_step)
        lo = observation.shape[0]
        if len(idx) != lo:
            raise ValueError(
                f"observation has {lo} frames but the trajectory observes "
                f"{len(idx)} (L={L}, t_step={t_step})"
            )
        for j in range(0, lo, chunk):
            sel = jnp.asarray(idx[j : j + chunk])
            sub = jnp.transpose(x[sel], (0, 2, 3, 1))
            proj = A1.project(
                sub, observation[j : j + chunk], iters=iters, method=method
            )
            x = x.at[sel].set(
                jnp.transpose(proj, (0, 3, 1, 2)).astype(x.dtype)
            )
    return x
