"""Memory-bounded guided sampling for year-scale trajectories.

The straightforward sampler (diffusion/sampler.py) carries the trajectory as
NHWC [L, H, W, C]; with C=4 variables the TPU tiles the minor dimension to
the 128-wide lane, padding every trajectory-sized buffer 32x — a year of
hourly fields (2.3 GB logical) becomes 73 GB physical and cannot fit a chip.

This module restructures guided PC sampling so that

- every trajectory-sized buffer is **NCHW** [L, C, H, W] (minor dims are the
  128-point spatial axes — perfectly lane-tiled, zero padding);
- the network still runs NHWC on lane-friendly [B, H, W, w*C] window chunks
  (transposed per chunk, ~1 ms at HBM bandwidth);
- one guided predictor step is three chunked passes with ~3 live
  trajectory buffers regardless of L:

  1. **window pass** — eps <- UNet over Markov windows, chunked scan
     writing a single [L, C, H, W] buffer in place;
  2. **observation-space guidance** — the observation operator A (spatial
     avg-pool + temporal striding) is linear, so the likelihood error uses
     A(x0) = (A(x) - sigma*A(eps))/mu with A computed by gathering only the
     observed frames: everything lives on the tiny observation grid;
  3. **frame-chunked update** — guided eps, x0 prediction, and DDIM
     re-noising applied slice-wise into one output buffer (Langevin
     correctors likewise, with the global step size accumulated chunk-wise).

Mathematically identical to sampler.sample + guidance.guided_eps with
``exact_grad=False`` (the production mode); property-tested against them.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from climate2weather_tpu.diffusion import steprules
from climate2weather_tpu.diffusion.guidance import (
    GaussianGuidance,
    SpatioTemporalCoarsening,
    check_observation_shape,
)


def _check_obs_nchw(guidance, nchw_shape):
    if guidance is not None:
        L, C, H, W = nchw_shape
        check_observation_shape(guidance, (L, H, W, C))


def _guidance_cache_parts(guidance):
    """(hashable statics, identity-checked objects) for the jit cache.

    Guidance arrays (y / std / gamma) are baked into the traced closure as
    constants-by-capture; a cached program compiled against one observation
    must never be reused for another.  Scalars go into the hashable key;
    arrays are compared by identity at lookup time.
    """
    if guidance is None:
        return ("noguide",), ()
    statics = [
        guidance.A.s_step,
        guidance.A.t_step,
        bool(guidance.exact_grad),
        str(guidance.prolong),
        tuple(guidance.y.shape),
    ]
    objs = [guidance.y]
    for v in (guidance.std, guidance.gamma):
        if isinstance(v, (int, float)):
            statics.append(float(v))
        else:
            statics.append(tuple(jnp.shape(v)))
            objs.append(v)
    return tuple(statics), tuple(objs)


def _jit_cache_lookup(jit_cache, statics, objs, build):
    """Compiled-program cache keyed on the FULL static configuration.

    ``statics`` must cover every hashable value the traced closure bakes in
    (schedule knobs, shapes, chunking); ``objs`` every closure-captured
    object (guidance arrays, proc_x0, shardings, the network apply fn)
    checked by identity — any mismatch rebuilds instead of silently reusing
    a program compiled against stale constants.
    """
    if jit_cache is None:
        return build()
    entry = jit_cache.get(statics)
    if (
        entry is not None
        and len(entry["objs"]) == len(objs)
        and all(a is b for a, b in zip(entry["objs"], objs))
    ):
        return entry["fn"]
    fn = build()
    jit_cache[statics] = {"fn": fn, "objs": objs}
    return fn


def nchw_window_pass(
    apply_fn: Callable,
    params,
    x: jnp.ndarray,
    t,
    markov_order: int,
    chunk_size: int,
    window_sharding=None,
    remat: bool = False,
) -> jnp.ndarray:
    """eps prediction over an NCHW trajectory, chunked over windows.

    ``x``: [L, C, H, W].  Gathers [B, w, C, H, W] frame chunks, transposes
    to the network's NHWC window layout [B, H, W, w*C] (frame-major
    channels), and writes centers/edges into one [L, C, H, W] buffer.
    """
    k = markov_order
    w = 2 * k + 1
    B = int(chunk_size)
    L, C, H, W = x.shape
    n = L - w + 1
    assert n >= 1, (
        f"trajectory length {L} is shorter than the score window {w} "
        f"(markov_order={k}); use the short sampler for L < 2k+1"
    )
    if n < B:
        B = n
    n_chunks = -(-n // B)

    def body(out, chunk_idx):
        win_start = jnp.minimum(chunk_idx * B, n - B)
        win_idx = win_start + jnp.arange(B)
        frame_idx = win_idx[:, None] + jnp.arange(w)[None, :]  # [B, w]
        xw = jnp.take(x, frame_idx, axis=0)  # [B, w, C, H, W]
        xw = jnp.moveaxis(xw, (1, 2), (3, 4)).reshape(B, H, W, w * C)
        if window_sharding is not None:
            xw = jax.lax.with_sharding_constraint(xw, window_sharding)
        o = apply_fn(params, xw, t).astype(x.dtype)  # [B, H, W, w*C]
        wo = o.reshape(B, H, W, w, C)
        centers = jnp.moveaxis(wo[:, :, :, k, :], 3, 1)  # [B, C, H, W]
        out = jax.lax.dynamic_update_slice(
            out, centers, (k + win_start, 0, 0, 0)
        )
        if k > 0:
            fe = jnp.transpose(wo[0, :, :, :k, :], (2, 3, 0, 1))  # [k, C, H, W]
            le = jnp.transpose(wo[B - 1, :, :, w - k :, :], (2, 3, 0, 1))
            out = jax.lax.cond(
                chunk_idx == 0,
                lambda o: jax.lax.dynamic_update_slice(o, fe, (0, 0, 0, 0)),
                lambda o: o,
                out,
            )
            out = jax.lax.cond(
                chunk_idx == n_chunks - 1,
                lambda o: jax.lax.dynamic_update_slice(o, le, (k + n, 0, 0, 0)),
                lambda o: o,
                out,
            )
        return out, None

    out0 = jnp.zeros_like(x)
    # remat: recompute the chunk forward in the backward pass, so vjp through
    # the scan (exact-grad guidance) stores only per-chunk inputs, not the
    # UNet activations of every window chunk
    out, _ = jax.lax.scan(
        jax.checkpoint(body) if remat else body, out0, jnp.arange(n_chunks)
    )
    return out


def _coarsen_nchw(A: SpatioTemporalCoarsening, arr: jnp.ndarray) -> jnp.ndarray:
    """A applied to an NCHW trajectory -> [Lo, C, h, w] (gather observed
    frames, then block-mean; only small arrays materialize)."""
    L = arr.shape[0]
    lo = -(-L // A.t_step)
    obs = jnp.take(arr, jnp.arange(lo) * A.t_step, axis=0)  # [Lo, C, H, W]
    s = A.s_step
    Lo, C, H, W = obs.shape
    return obs.reshape(Lo, C, H // s, s, W // s, s).mean(axis=(3, 5))


def _param_nchw(value) -> jnp.ndarray:
    """Scalar / per-channel [C] / NHWC-broadcast [1,1,1,C] likelihood
    parameter -> a shape broadcastable against NCHW [Lo, C, h, w]."""
    v = jnp.asarray(value, jnp.float32)
    if v.ndim == 0:
        return v
    if v.ndim == 1:
        return v.reshape(1, -1, 1, 1)
    if v.ndim == 4:
        return jnp.moveaxis(v, 3, 1)
    raise ValueError(f"unsupported likelihood parameter shape {v.shape}")


def _obs_err_nchw(guidance, process, x, eps, t):
    """(y - A(x0)) / var in observation space [Lo, C, h, w] via linearity."""
    mu = process.mu(t)
    sigma = process.sigma(t)
    ax = _coarsen_nchw(guidance.A, x).astype(jnp.float32)
    aeps = _coarsen_nchw(guidance.A, eps).astype(jnp.float32)
    a_x0 = (ax - sigma * aeps) / mu
    # guidance.y is NHWC-shaped [Lo, h, w, C]; move to NCHW
    y = jnp.moveaxis(guidance.y.astype(jnp.float32), 3, 1)
    std = _param_nchw(guidance.std)
    gamma = _param_nchw(guidance.gamma)
    var = std**2 + gamma * (sigma / mu) ** 2
    return (y - a_x0) / var


def _guided_eps_chunk_nchw(guidance, process, eps_chunk, err, f0, t):
    """eps' = eps - sigma * A^T(err)/mu on NCHW frames [f0, f0+F).

    ``guidance.prolong`` swaps the piecewise-constant exact adjoint for the
    band-limited prolongation (SpatioTemporalCoarsening.prolong semantics:
    spectral zero-pad or bilinear, same 1/s^2 block-mean gain and zero rows
    at unobserved frames)."""
    if guidance is None:
        return eps_chunk
    A = guidance.A
    mu = process.mu(t)
    sigma = process.sigma(t)
    F = eps_chunk.shape[0]
    frames = f0 + jnp.arange(F)
    obs_idx = frames // A.t_step
    mask = (frames % A.t_step == 0).astype(jnp.float32)
    err_rows = jnp.take(err, jnp.clip(obs_idx, 0, err.shape[0] - 1), axis=0)
    s = A.s_step
    Fr, C, h, w = err_rows.shape
    if guidance.prolong and guidance.prolong_method() == "spectral":
        spec = jnp.fft.fftshift(
            jnp.fft.fft2(err_rows.astype(jnp.float32), axes=(-2, -1)),
            axes=(-2, -1),
        )
        pad = jnp.zeros((Fr, C, h * s, w * s), spec.dtype)
        y0 = (h * s - h) // 2
        x0 = (w * s - w) // 2
        pad = pad.at[:, :, y0 : y0 + h, x0 : x0 + w].set(spec)
        up = jnp.fft.ifft2(jnp.fft.ifftshift(pad, axes=(-2, -1)),
                           axes=(-2, -1)).real
    elif guidance.prolong:
        up = jax.image.resize(
            err_rows.astype(jnp.float32), (Fr, C, h * s, w * s),
            method="bilinear",
        ) / (s * s)
    else:
        up = jnp.broadcast_to(
            err_rows[:, :, :, None, :, None] / (s * s), (Fr, C, h, s, w, s)
        ).reshape(Fr, C, h * s, w * s)
    grad = up * mask[:, None, None, None] / mu
    w = guidance.anneal_weight(t)
    return eps_chunk - (w * sigma * grad).astype(eps_chunk.dtype)


def _exact_guided_eps_nchw(
    guidance, process, eps_apply, markov_order, chunk_size, window_sharding,
    params_, x, t,
):
    """eps - sigma * grad_x log p(y|x_t) with the gradient autodiffed
    through the (remat'd) chunked window scan — the reference's
    exact_grad=True semantics (src/thor/score.py:28-35,48-57).  Shared by
    both long samplers so the variance/err formula has one home."""
    mu = process.mu(t)
    sigma = process.sigma(t)
    y = jnp.moveaxis(guidance.y.astype(jnp.float32), 3, 1)
    std = _param_nchw(guidance.std)
    gamma = _param_nchw(guidance.gamma)
    var = std**2 + gamma * (sigma / mu) ** 2

    def log_p(xx):
        eps = nchw_window_pass(
            eps_apply, params_, xx, t, markov_order, chunk_size,
            window_sharding, remat=True,
        )
        a_x0 = (
            _coarsen_nchw(guidance.A, xx).astype(jnp.float32)
            - sigma * _coarsen_nchw(guidance.A, eps).astype(jnp.float32)
        ) / mu
        err = y - a_x0
        return -jnp.sum(err**2 / var) / 2.0, eps

    grad, eps = jax.grad(log_p, has_aux=True)(x)
    w = guidance.anneal_weight(t)
    return eps - (w * sigma * grad).astype(eps.dtype)


def _make_guided_eps_and_err(
    guidance, process, eps_apply, markov_order, chunk_size, window_sharding
):
    """Build ``(params, x, t) -> (eps, err)``: exact mode folds guidance into
    eps via autodiff; detached mode returns the obs-space error for lazy
    chunked fusion.  The single home of the dispatch both long samplers
    share (predictor, corrector, and final denoise all consume it)."""
    exact = guidance is not None and guidance.exact_grad
    if exact and guidance.prolong:
        raise ValueError(
            "prolong guidance is a detached-mode preconditioner; "
            "exact_grad=True has no prolonged counterpart"
        )

    def guided_eps_and_err(params_, x, t):
        if exact:
            return _exact_guided_eps_nchw(
                guidance, process, eps_apply, markov_order, chunk_size,
                window_sharding, params_, x, t,
            ), None
        eps = nchw_window_pass(
            eps_apply, params_, x, t, markov_order, chunk_size, window_sharding
        )
        err = (
            _obs_err_nchw(guidance, process, x, eps, t)
            if guidance is not None
            else None
        )
        return eps, err

    return guided_eps_and_err


def _make_final_denoise(
    guided_eps_and_err, guidance, process, proc_x0, F, L, n_fchunks
):
    """Build the shared guided t=0 posterior-mean pass (``denoise_final``):
    one extra score evaluation, chunked over frames, with ``proc_x0``
    applied to every x0 estimate exactly like the in-loop updates
    (sampler.sample parity)."""

    def final_denoise(params_, x):
        t0 = jnp.asarray(0.0, jnp.float32)
        eps, err = guided_eps_and_err(params_, x, t0)
        mu = process.mu(t0)
        sigma = process.sigma(t0)

        def body(out, ci):
            f0 = jnp.minimum(ci * F, L - F)
            x_c = jax.lax.dynamic_slice_in_dim(x, f0, F)
            e_c = jax.lax.dynamic_slice_in_dim(eps, f0, F)
            eg = _guided_eps_chunk_nchw(
                guidance if err is not None else None, process, e_c, err, f0, t0
            )
            x0 = steprules.predict_x0(
                x_c, eg, mu.astype(x_c.dtype), sigma.astype(x_c.dtype)
            )
            if proc_x0 is not None:
                x0 = proc_x0(x0)
            return jax.lax.dynamic_update_slice_in_dim(out, x0, f0, 0), None

        out, _ = jax.lax.scan(body, jnp.zeros_like(x), jnp.arange(n_fchunks))
        return out

    return final_denoise


def _save_carry(path, carry, step, digest):
    """Atomically persist a sampler carry pytree (resume checkpoint).

    bf16 leaves are stored as uint16 views (the .npy format has no bfloat16);
    dtypes are recorded and restored on load.
    """
    import os

    import numpy as np

    leaves = [np.asarray(x) for x in jax.device_get(jax.tree_util.tree_leaves(carry))]
    payload = {"step": np.int64(step), "digest": np.str_(digest),
               "dtypes": np.asarray([str(l.dtype) for l in leaves])}
    for j, leaf in enumerate(leaves):
        payload[f"a{j}"] = (
            leaf.view(np.uint16) if str(leaf.dtype) == "bfloat16" else leaf
        )
    tmp = path + ".tmp.npz"
    np.savez(tmp, **payload)
    os.replace(tmp, path)


def _load_carry(path, init, digest):
    """Restore a carry saved by _save_carry; returns (carry, step).

    Falls back to ``(init, 0)`` on any mismatch (missing/corrupt file,
    different sampler config digest, structure drift) — a resume must never
    be less safe than starting over.
    """
    import os

    import numpy as np

    if not os.path.exists(path):
        return init, 0
    try:
        z = np.load(path, allow_pickle=False)
        if str(z["digest"]) != digest:
            return init, 0
        leaves, treedef = jax.tree_util.tree_flatten(init)
        dtypes = [str(d) for d in z["dtypes"]]
        if len(dtypes) != len(leaves):
            return init, 0
        new = []
        for j, (ref, dt) in enumerate(zip(leaves, dtypes)):
            raw = z[f"a{j}"]
            if dt == "bfloat16":
                raw = raw.view(jnp.bfloat16)
            if raw.shape != ref.shape or str(raw.dtype) != str(ref.dtype):
                return init, 0
            new.append(jnp.asarray(raw))
        return jax.tree_util.tree_unflatten(treedef, new), int(z["step"])
    except Exception as e:
        print(f"sampler resume: ignoring unreadable checkpoint {path} ({e})",
              flush=True)
        return init, 0


def _stepwise_drive(run_chunk, carry, xs, k, total_steps, verbose, ckpt=None):
    """Drive a scan in chunks of k leading-axis elements from Python.

    At most two program shapes compile (full chunks + one remainder); the
    NaN flag (last carry element) is checked between calls so a poisoned
    run stops early like the reference's mid-sampling raise.

    ``ckpt = (path, every_calls, digest)`` enables crash/wedge-resumable
    sampling: the carry is persisted every ``every_calls`` chunks (atomic
    write; fetched on the main thread — background-thread device reads
    starve behind a dispatching main thread) and restored on the next
    invocation with the same path + config digest.  The fetch costs one
    trajectory download per save, so pick the cadence against the relay
    bandwidth; the file is removed on successful completion.
    """
    import os

    n = int(xs.shape[0])
    i = 0
    calls = 0
    if ckpt is not None:
        path, every, digest = ckpt
        carry, i = _load_carry(path, carry, digest)
        if i and verbose:
            print(f"sampling: resumed at step {i}/{total_steps}", flush=True)
    while i < n:
        j = min(i + k, n)
        carry = run_chunk(carry, xs[i:j])
        i = j
        calls += 1
        if verbose:
            print(f"sampling: step {i}/{total_steps}", flush=True)
        if bool(jax.device_get(carry[-1])):
            break
        if ckpt is not None and i < n and calls % every == 0:
            _save_carry(path, carry, i, digest)
    if ckpt is not None and os.path.exists(path):
        os.remove(path)
    return carry[0], carry[-1]


def sample_guided_long(
    process,
    eps_apply: Callable,
    params,
    noise: jnp.ndarray,
    *,
    markov_order: int,
    chunk_size: int = 128,
    guidance: Optional[GaussianGuidance] = None,
    steps: int = 64,
    corrections: int = 0,
    tau: float = 1.0,
    corrector_variance_exact: bool = False,
    rng: Optional[jax.Array] = None,
    frame_chunk: int = 256,
    window_sharding=None,
    steps_per_call: Optional[int] = None,
    verbose: bool = False,
    jit_cache: Optional[dict] = None,
    proc_x0: Optional[Callable] = None,
    denoise_final: bool = False,
    resume_path: Optional[str] = None,
    resume_every: int = 8,
):
    """Guided PC sampling with memory bounded in the trajectory length.

    ``resume_path`` (stepwise mode only) makes the run crash/wedge-resumable:
    the carry is persisted there every ``resume_every`` jitted calls and
    restored on relaunch when the sampler config digest matches (see
    ``_stepwise_drive``); removed on success.

    ``denoise_final`` adds one guided score pass at t=0 and returns the
    posterior-mean estimate instead of the re-noised state, removing the
    sigma(0) = eta residual noise floor (see sampler.sample); chunked like
    every other trajectory pass, so the memory bound is unchanged.

    ``noise`` is NCHW [L, C, H, W]; ``eps_apply(params, windows_nhwc, t)``
    is the window network; ``guidance`` (optional) supports both the
    detached analytic mode (production) and ``exact_grad=True`` — the
    latter autodiffs the likelihood through the remat'd chunked window
    scan (reference src/thor/score.py:28-35 semantics at year scale).
    ``proc_x0`` post-processes the denoised estimate each predictor step
    (reference src/thor/pipelines.py:41-46); it receives NCHW [F, C, H, W]
    frame chunks.  Returns ``(x_nchw, nan_detected)``.

    ``steps_per_call`` splits the schedule across multiple jitted calls (a
    Python loop carries the state): year-scale runs can take minutes per
    execution, which some runtimes kill as hung — and this restores per-call
    progress reporting (the reference's tqdm bar).  One compile serves all
    calls (time pairs are an argument).  Do not use inside an outer jit.
    NOTE: in stepwise mode the caller's ``noise`` buffer is donated on the
    first chunk (memory) — do not reuse it afterwards.

    ``jit_cache``: pass the same dict across repeated calls to reuse the
    compiled chunk program instead of retracing per call (e.g. per-sample
    loops in the downscaling driver).  The cache is keyed on the full
    static configuration (schedule knobs, shapes, chunking, guidance
    arrays by identity), so calls with different configs coexist safely.
    """
    _check_obs_nchw(guidance, noise.shape)
    if corrections > 0 and rng is None:
        # sampler.sample parity: a silent PRNGKey(0) fallback would draw the
        # corrector noise of every "independent" ensemble member identically
        raise ValueError("corrections > 0 requires an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    L = noise.shape[0]
    F = min(frame_chunk, L)
    n_fchunks = -(-L // F)
    dt = 1.0 / steps
    time_steps = jnp.linspace(1.0, 0.0, steps + 1, dtype=jnp.float32)[:-1]

    guided_eps_and_err = _make_guided_eps_and_err(
        guidance, process, eps_apply, markov_order, chunk_size, window_sharding
    )
    final_denoise = _make_final_denoise(
        guided_eps_and_err, guidance, process, proc_x0, F, L, n_fchunks
    )

    def frame_pass(x, eps, err, t, t2, delta=None, z_key=None):
        mu = process.mu(t)
        sigma = process.sigma(t)
        mu2 = process.mu(t2)
        sigma2 = process.sigma(t2)

        def body(out, ci):
            f0 = jnp.minimum(ci * F, L - F)
            x_c = jax.lax.dynamic_slice_in_dim(x, f0, F)
            e_c = jax.lax.dynamic_slice_in_dim(eps, f0, F)
            eg = _guided_eps_chunk_nchw(
                guidance if err is not None else None, process, e_c, err, f0, t
            )
            if delta is None:
                new = steprules.ddim_step(
                    x_c,
                    eg,
                    mu.astype(x_c.dtype),
                    sigma.astype(x_c.dtype),
                    mu2.astype(x_c.dtype),
                    sigma2.astype(x_c.dtype),
                    proc_x0=proc_x0,
                )
            else:
                z = jax.random.normal(
                    jax.random.fold_in(z_key, ci), x_c.shape, x_c.dtype
                )
                new = steprules.langevin_step(
                    x_c,
                    eg,
                    z,
                    delta.astype(x_c.dtype),
                    sigma2.astype(x_c.dtype),
                    sqrt2delta=steprules.langevin_noise_scale(
                        tau, delta, corrector_variance_exact
                    ).astype(x_c.dtype),
                )
            return jax.lax.dynamic_update_slice_in_dim(out, new, f0, 0), None

        out0 = jnp.zeros_like(x)
        out, _ = jax.lax.scan(body, out0, jnp.arange(n_fchunks))
        return out

    def guided_sumsq(eps, err, t):
        def body(acc, ci):
            f0 = jnp.minimum(ci * F, L - F)
            e_c = jax.lax.dynamic_slice_in_dim(eps, f0, F)
            eg = _guided_eps_chunk_nchw(
                guidance if err is not None else None, process, e_c, err, f0, t
            )
            frames = f0 + jnp.arange(F)
            fresh = (frames >= ci * F).astype(jnp.float32)
            ss = jnp.sum(
                jnp.square(eg.astype(jnp.float32)) * fresh[:, None, None, None]
            )
            return acc + ss, None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), jnp.arange(n_fchunks))
        return acc

    def step(params_, carry, t):
        x, key, nan_flag = carry
        t2 = t - dt

        eps, err = guided_eps_and_err(params_, x, t)
        x = frame_pass(x, eps, err, t, t2)

        for _ in range(corrections):
            key, zkey = jax.random.split(key)
            eps, err = guided_eps_and_err(params_, x, t2)
            delta = steprules.langevin_delta(
                tau, guided_sumsq(eps, err, t2) / eps.size
            )
            x = frame_pass(x, eps, err, t2, t2, delta=delta, z_key=zkey)

        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return (x, key, nan_flag), None

    init = (noise, rng, jnp.asarray(False))
    if steps_per_call is None:
        (x, _, nan_flag), _ = jax.lax.scan(
            lambda c, t: step(params, c, t), init, time_steps
        )
        if denoise_final:
            x = final_denoise(params, x)
            nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return x, nan_flag

    # params is a jit ARGUMENT (closure capture would embed it as HLO
    # constants — oversized programs get rejected by remote compilers).
    # The cache key carries every static the closure bakes in: schedule
    # knobs (dt is a function of `steps`!), trajectory/chunk geometry, and
    # the guidance config; closure-captured objects (y/std/gamma arrays,
    # proc_x0, sharding, the apply fn) are identity-checked at lookup.
    g_statics, g_objs = _guidance_cache_parts(guidance)
    statics = (
        "pc", steps, corrections, float(tau), bool(corrector_variance_exact),
        tuple(noise.shape), str(noise.dtype),
        F, chunk_size, markov_order,
    ) + g_statics
    objs = g_objs + (eps_apply, process, proc_x0, window_sharding)
    run_chunk_p = _jit_cache_lookup(
        jit_cache, statics, objs,
        lambda: jax.jit(
            lambda params_, carry, ts: jax.lax.scan(
                lambda c, t: step(params_, c, t), carry, ts
            )[0],
            donate_argnums=(1,),
        ),
    )
    run_chunk = lambda carry, ts: run_chunk_p(params, carry, ts)
    ckpt = (resume_path, int(resume_every), repr(statics)) if resume_path else None
    x, nan_flag = _stepwise_drive(
        run_chunk, init, time_steps, steps_per_call, steps, verbose, ckpt=ckpt
    )
    if denoise_final:
        fin_p = _jit_cache_lookup(
            jit_cache, statics + ("final",), objs, lambda: jax.jit(final_denoise)
        )
        x = fin_p(params, x)
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
    return x, nan_flag


def sample_dpmpp2m_long(
    process,
    eps_apply: Callable,
    params,
    noise: jnp.ndarray,
    *,
    markov_order: int,
    chunk_size: int = 128,
    guidance: Optional[GaussianGuidance] = None,
    steps: int = 64,
    rng: Optional[jax.Array] = None,
    frame_chunk: int = 256,
    window_sharding=None,
    traj_dtype=None,
    steps_per_call: Optional[int] = None,
    verbose: bool = False,
    jit_cache: Optional[dict] = None,
    proc_x0: Optional[Callable] = None,
    denoise_final: bool = False,
    order: int = 2,
    sde_eta: float = 0.0,
    resume_path: Optional[str] = None,
    resume_every: int = 8,
):
    """DPM-Solver++(2M) (see sampler.sample_dpmpp2m) in the NCHW
    memory-bounded form: one extra [L, C, H, W] buffer carries the previous
    x0 prediction.  log-SNR step spacing; detached and exact-grad guidance
    (the latter autodiffs through the remat'd window scan).  ``proc_x0``
    post-processes denoised estimates on NCHW [F, C, H, W] frame chunks.
    ``steps_per_call`` splits the schedule across jitted calls (see
    sample_guided_long).

    ``order=3`` selects DPM-Solver++(3M) (sampler.sample_dpmpp3m): one more
    trajectory-sized buffer carries the second-previous x0 prediction, with
    first/second-order warm-up on the first two steps.

    ``sde_eta > 0`` selects SDE-DPM-Solver++(2M) (order 2 only; see
    sampler.sample_dpmpp2m): per-step noise injection of strength eta at
    zero extra network evaluations; requires ``rng``.

    The multistep method needs ~5 trajectory-sized carries (6 at order 3);
    at the full-year scale that exceeds a 16 GB chip in fp32, so pass
    ``traj_dtype=jnp.bfloat16`` to halve them (schedule math stays fp32;
    observation-space guidance is computed in fp32).
    """
    assert order in (2, 3), order
    _check_obs_nchw(guidance, noise.shape)
    if sde_eta < 0:
        raise ValueError(f"sde_eta must be >= 0, got {sde_eta}")
    if sde_eta > 0 and order != 2:
        raise ValueError("sde_eta requires order=2 (SDE form is 2M-only)")
    if sde_eta > 0 and rng is None:
        # no silent PRNGKey(0) fallback (see sample_guided_long's corrector)
        raise ValueError("sde_eta > 0 requires an rng key")
    if rng is None:
        rng = jax.random.PRNGKey(0)
    use_sde = sde_eta > 0
    from climate2weather_tpu.diffusion.sampler import logsnr_time_grid

    if traj_dtype is not None:
        noise = noise.astype(traj_dtype)
    L = noise.shape[0]
    F = min(frame_chunk, L)
    n_fchunks = -(-L // F)
    time_steps = logsnr_time_grid(process, steps)

    guided_eps_and_err = _make_guided_eps_and_err(
        guidance, process, eps_apply, markov_order, chunk_size, window_sharding
    )
    final_denoise = _make_final_denoise(
        guided_eps_and_err, guidance, process, proc_x0, F, L, n_fchunks
    )

    def step(params_, carry, ts):
        if order == 3:
            x, prev_x0, prev2_x0, prev_h, prev2_h, i, nan_flag = carry
            is_first = i < 1
            key = zkey = None
        elif use_sde:
            x, prev_x0, prev_h, is_first, key, nan_flag = carry
            prev2_x0 = prev2_h = i = None
            key, zkey = jax.random.split(key)
        else:
            x, prev_x0, prev_h, is_first, nan_flag = carry
            prev2_x0 = prev2_h = i = key = zkey = None
        t_prev, t_cur = ts
        eps, err = guided_eps_and_err(params_, x, t_prev)

        mu = process.mu(t_prev)
        sigma = process.sigma(t_prev)
        if use_sde:
            h, decay_f, growth_f, corr_f, nscale_f = steprules.dpm_sde_scalar_coeffs(
                process, t_prev, t_cur, prev_h, sde_eta
            )
            decay = decay_f.astype(x.dtype)
            growth = growth_f.astype(x.dtype)
            corr = corr_f.astype(x.dtype)
            nscale = nscale_f.astype(x.dtype)
        else:
            h, sigma_ratio_f, growth_f, c_cur_f, c_prev_f = steprules.dpm_scalar_coeffs(
                process, t_prev, t_cur, prev_h
            )
            sigma_ratio = sigma_ratio_f.astype(x.dtype)
            growth = growth_f.astype(x.dtype)
            c_multi_cur = c_cur_f.astype(x.dtype)
            c_multi_prev = c_prev_f.astype(x.dtype)
        if order == 3:
            _, _, _, w0_f, w1_f, w2_f = steprules.dpm3_scalar_coeffs(
                process, t_prev, t_cur, prev_h, prev2_h
            )
            w0, w1, w2 = (
                w0_f.astype(x.dtype), w1_f.astype(x.dtype), w2_f.astype(x.dtype)
            )

        def body(carry2, ci):
            out, new_prev = carry2
            f0 = jnp.minimum(ci * F, L - F)
            x_c = jax.lax.dynamic_slice_in_dim(x, f0, F)
            e_c = jax.lax.dynamic_slice_in_dim(eps, f0, F)
            p_c = jax.lax.dynamic_slice_in_dim(prev_x0, f0, F)
            eg = _guided_eps_chunk_nchw(
                guidance if err is not None else None,
                process, e_c, err, f0, t_prev,
            )
            x0 = steprules.predict_x0(
                x_c, eg, mu.astype(x_c.dtype), sigma.astype(x_c.dtype)
            )
            if proc_x0 is not None:
                x0 = proc_x0(x0)
            if use_sde:
                z = jax.random.normal(
                    jax.random.fold_in(zkey, ci), x_c.shape, x_c.dtype
                )
                new = steprules.dpm_sde_step(
                    x_c, x0, p_c, z, decay, growth, corr, nscale, ~is_first
                )
            else:
                d = steprules.dpm_data_estimate(
                    x0, p_c, c_multi_cur, c_multi_prev, ~is_first
                )
                if order == 3:
                    p2_c = jax.lax.dynamic_slice_in_dim(prev2_x0, f0, F)
                    d3 = steprules.dpm3_data_estimate(x0, p_c, p2_c, w0, w1, w2)
                    d = jnp.where(i >= 2, d3, d)
                new = steprules.dpm_step(x_c, d, sigma_ratio, growth)
            out = jax.lax.dynamic_update_slice_in_dim(out, new, f0, 0)
            new_prev = jax.lax.dynamic_update_slice_in_dim(new_prev, x0, f0, 0)
            return (out, new_prev), None

        (x_new, x0_buf), _ = jax.lax.scan(
            body, (jnp.zeros_like(x), jnp.zeros_like(x)), jnp.arange(n_fchunks)
        )
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x_new)))
        if order == 3:
            return (x_new, x0_buf, prev_x0, h, prev_h, i + 1, nan_flag), None
        if use_sde:
            return (x_new, x0_buf, h, jnp.asarray(False), key, nan_flag), None
        return (x_new, x0_buf, h, jnp.asarray(False), nan_flag), None

    if order == 3:
        init = (
            noise,
            jnp.zeros_like(noise),
            jnp.zeros_like(noise),
            jnp.ones((), jnp.float32),
            jnp.ones((), jnp.float32),
            jnp.zeros((), jnp.int32),
            jnp.asarray(False),
        )
    elif use_sde:
        init = (
            noise,
            jnp.zeros_like(noise),
            jnp.ones((), jnp.float32),
            jnp.asarray(True),
            rng,
            jnp.asarray(False),
        )
    else:
        init = (
            noise,
            jnp.zeros_like(noise),
            jnp.ones((), jnp.float32),
            jnp.asarray(True),
            jnp.asarray(False),
        )
    ts_pairs = jnp.stack([time_steps[:-1], time_steps[1:]], axis=1)  # [steps, 2]
    if steps_per_call is None:
        final_carry, _ = jax.lax.scan(
            lambda c, t: step(params, c, t), init, (ts_pairs[:, 0], ts_pairs[:, 1])
        )
        x, nan_flag = final_carry[0], final_carry[-1]
        if denoise_final:
            x = final_denoise(params, x)
            nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
        return x, nan_flag

    # params as jit argument (see sample_guided_long); cache keyed on the
    # full static config + identity of closure-captured objects.
    g_statics, g_objs = _guidance_cache_parts(guidance)
    statics = (
        "dpm", order, float(sde_eta), tuple(noise.shape), str(noise.dtype),
        F, chunk_size, markov_order,
    ) + g_statics
    objs = g_objs + (eps_apply, process, proc_x0, window_sharding)
    run_chunk_p = _jit_cache_lookup(
        jit_cache, statics, objs,
        lambda: jax.jit(
            lambda params_, carry, ts: jax.lax.scan(
                lambda c, t: step(params_, c, t), carry, (ts[:, 0], ts[:, 1])
            )[0],
            donate_argnums=(1,),
        ),
    )
    run_chunk = lambda carry, ts: run_chunk_p(params, carry, ts)
    ckpt = (resume_path, int(resume_every), repr(statics)) if resume_path else None
    x, nan_flag = _stepwise_drive(
        run_chunk, init, ts_pairs, steps_per_call, steps, verbose, ckpt=ckpt
    )
    if denoise_final:
        fin_p = _jit_cache_lookup(
            jit_cache, statics + ("final",), objs, lambda: jax.jit(final_denoise)
        )
        x = fin_p(params, x)
        nan_flag = jnp.logical_or(nan_flag, ~jnp.all(jnp.isfinite(x)))
    return x, nan_flag
