"""Benchmark: guided-sampler throughput + year-downscaling wall-clock.

Prints ONE JSON line with the required keys {"metric", "value", "unit",
"vs_baseline"} (headline = sampler net-evals/sec/chip) plus secondary
fields for the second north-star metric (BASELINE.md): measured wall-clock
extrapolated to hours per 2014-year sample for the two production samplers
(PC-256 and DPM++(2M)-64), and an 8-virtual-device window-sharding overhead
check.

Workload (BASELINE.md): the production ~72M-param sda_unet
(configs/sda_unet.yml) evaluating Markov-blanket windows of
[batch<=128, 128, 128, 52] inside the guided sampler — the unit of the
reference's sampler cost model (SURVEY.md §3.2: year run = 2.23M
window-evals/sample executed as 17.7k batch-forwards).

Baseline: the reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against an analytic A100 estimate of the
reference implementation documented below:

  FLOPs/window-eval (fwd): 113 GFLOP from XLA cost analysis (measured)
  A100 dense fp16 peak: 312 TFLOPS; assumed 35% MFU for this conv/attention
  UNet under torch fp16-mixed -> ~109 TFLOPS -> ~1.0k evals/s net-only.
  Reference pipeline overheads (torch.func.jacrev with chunk_size=1 through
  fold/unfold + CPU<->GPU window streaming each chunk,
  src/thor/score.py:28-35,165-183) conservatively halve that -> 520 evals/s.
  Year-sample baseline: 2.23M evals / 520 evals/s = 1.191 h (PC-256).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import yaml

A100_BASELINE_EVALS_PER_SEC = 520.0
YEAR_EVALS = 256 * (8737 - 13 + 1)  # reference year-run cost model
A100_BASELINE_YEAR_HOURS = YEAR_EVALS / A100_BASELINE_EVALS_PER_SEC / 3600.0


def _sync(arr):
    # force completion with a real device->host fetch: block_until_ready
    # does not block under remote-relay execution
    return float(jnp.asarray(arr).ravel()[0])


def measure_year_sampler(process, eps_fn, params, A, num_features, res, markov_order):
    """Measured seconds/step at the full year length (L=8737, NCHW
    memory-bounded samplers), extrapolated to hours per year sample."""
    from climate2weather_tpu.diffusion.guidance import GaussianGuidance
    from climate2weather_tpu.diffusion.long_sampler import (
        sample_dpmpp2m_long,
        sample_guided_long,
    )

    L = 8737
    rng = jax.random.PRNGKey(7)
    lo = -(-L // A.t_step)
    y = jax.random.normal(rng, (lo, res // A.s_step, res // A.s_step, num_features))
    guidance = GaussianGuidance(A=A, y=y, std=0.1, gamma=7e-4, exact_grad=False)

    def noise():
        return jax.random.normal(rng, (L, num_features, res, res), jnp.float32)

    def timed(fn, *a, **kw):
        t0 = time.time()
        out, nan = fn(*a, **kw)
        _sync(out)
        return time.time() - t0

    results = {}
    common = dict(
        markov_order=markov_order, chunk_size=128, guidance=guidance,
        steps_per_call=1,
    )
    # Warm the jit cache for BOTH step counts with discarded calls (the PC
    # program's cache key includes `steps` — dt is baked into the closure),
    # then time warm 1-step and 5-step calls: difference = 4 warm steps.
    # (Differencing a cold call against a warm one subtracts the compile
    # from the step estimate — that once produced a NEGATIVE hours/sample.)
    cache: dict = {}
    for warm_steps in (1, 5):
        timed(  # compile; discard
            sample_guided_long, process, eps_fn, params, noise(),
            steps=warm_steps, corrections=0, jit_cache=cache, **common,
        )
    t1 = timed(
        sample_guided_long, process, eps_fn, params, noise(),
        steps=1, corrections=0, jit_cache=cache, **common,
    )
    t5 = timed(
        sample_guided_long, process, eps_fn, params, noise(),
        steps=5, corrections=0, jit_cache=cache, **common,
    )
    pc_step = (t5 - t1) / 4.0
    results["pc256_hours"] = pc_step * 256 / 3600.0
    # DPM++(2M): bf16 trajectory (production year config), 64 steps.
    # (time pairs are data in the DPM program, so one compile serves both.)
    cache = {}
    timed(  # compile; discard
        sample_dpmpp2m_long, process, eps_fn, params, noise(),
        steps=1, traj_dtype=jnp.bfloat16, jit_cache=cache, **common,
    )
    t1 = timed(
        sample_dpmpp2m_long, process, eps_fn, params, noise(),
        steps=1, traj_dtype=jnp.bfloat16, jit_cache=cache, **common,
    )
    t3 = timed(
        sample_dpmpp2m_long, process, eps_fn, params, noise(),
        steps=3, traj_dtype=jnp.bfloat16, jit_cache=cache, **common,
    )
    results["dpm64_hours"] = (t3 - t1) / 2.0 * 64 / 3600.0
    return results


_SCALING_CHILD = r"""
import json, os, time
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from climate2weather_tpu.diffusion.guidance import GaussianGuidance, SpatioTemporalCoarsening
from climate2weather_tpu.diffusion.long_sampler import sample_guided_long
from climate2weather_tpu.diffusion.process import VPCosineProcess
from climate2weather_tpu.diffusion.window import make_batched_eps_fn
from climate2weather_tpu.models.score_net import build_score_unet
from climate2weather_tpu.parallel.mesh import make_mesh, window_sharding

C, window, res, L, chunk = 2, 5, 32, 68, 16
net = build_score_unet(dict(channels=C * window, embedding_dim=32,
                            hidden_channels=(8, 16), hidden_blocks=(1, 1),
                            attention_levels=()), dtype=jnp.float32)
rng = jax.random.PRNGKey(0)
params = net.init(rng, jnp.zeros((1, res, res, C * window)), jnp.ones((1,)))
proc = VPCosineProcess()
A = SpatioTemporalCoarsening(s_step=4, t_step=4)
y = jax.random.normal(rng, (L // 4, res // 4, res // 4, C))
g = GaussianGuidance(A=A, y=y, std=0.1, gamma=7e-4)
eps_fn = make_batched_eps_fn(net.apply)
noise = jax.random.normal(rng, (L, C, res, res))

def run(ws, steps, cache):
    # the shared jit_cache is essential: without it every call retraces and
    # recompiles, and the "per-step" numbers measure compile time
    out, _ = sample_guided_long(proc, eps_fn, params, noise,
        markov_order=window // 2, chunk_size=chunk, guidance=g, steps=steps,
        window_sharding=ws, jit_cache=cache)
    return float(jnp.asarray(out).ravel()[0])

def t_per_step(ws):
    cache = {}
    run(ws, 2, cache)  # compile
    # best-of-2 on a 2-vs-10-step difference: the tiny workload's per-step
    # time is ~ms, so single-shot differencing is dominated by host noise
    best = float("inf")
    for _ in range(2):
        t0 = time.time(); run(ws, 2, cache); t2 = time.time() - t0
        t0 = time.time(); run(ws, 10, cache); t10 = time.time() - t0
        best = min(best, (t10 - t2) / 8.0)
    return best

t_single = t_per_step(None)
mesh = make_mesh(data=1, window=8)
t_sharded = t_per_step(window_sharding(mesh))
print(json.dumps({"overhead_pct": round((t_sharded / t_single - 1.0) * 100, 1)}))
"""


def measure_scaling_overhead():
    """Window-sharded sampler on an 8-virtual-device CPU mesh vs unsharded
    single-device, same total work: percent wall-clock overhead per step
    (ICI-analog partition/collective cost; virtual devices share host
    cores, so compute is identical and the delta is orchestration).

    Reading: values <= 0 mean no sharding overhead is detectable.  Negative
    values are a cache-locality artifact of emulation — eight per-shard
    executions with smaller working sets can beat one large execution on a
    single host core — not a real speedup."""
    try:
        out = subprocess.run(
            [sys.executable, "-c", _SCALING_CHILD],
            capture_output=True, text=True, timeout=900,
            env={k: v for k, v in os.environ.items()
                 if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
        )
        line = out.stdout.strip().splitlines()[-1]
        return json.loads(line)["overhead_pct"]
    except Exception:
        return None


def main():
    from climate2weather_tpu.diffusion.guidance import (
        GaussianGuidance,
        SpatioTemporalCoarsening,
    )
    from climate2weather_tpu.diffusion.process import VPCosineProcess
    from climate2weather_tpu.diffusion.window import make_batched_eps_fn
    from climate2weather_tpu.models.score_net import build_score_unet

    with open("configs/sda_unet.yml") as f:
        mdl = yaml.safe_load(f)
    num_features, window, res = 4, 13, 128
    markov_order = window // 2
    mdl["channels"] = num_features * window
    net = build_score_unet(mdl, dtype=jnp.bfloat16)

    rng = jax.random.PRNGKey(0)
    params = net.init(
        rng, jnp.zeros((1, res, res, mdl["channels"]), jnp.float32), jnp.ones((1,))
    )
    n_params = sum(p.size for p in jax.tree.leaves(params))

    chunk = 128
    n_chunks = 4
    steps = 4
    L = n_chunks * chunk + window - 1  # exactly n_chunks full chunks
    n_windows = L - window + 1

    process = VPCosineProcess()
    A = SpatioTemporalCoarsening(s_step=16, t_step=6)
    gt = jax.random.normal(jax.random.fold_in(rng, 1), (L, res, res, num_features))
    y = A(gt)
    eps_fn = make_batched_eps_fn(net.apply)

    # Production path: the NCHW memory-bounded long sampler (NHWC trajectory
    # buffers lane-pad 32x at C=4 and OOM at year scale).  params and y are
    # jit ARGUMENTS (closure capture would embed 72M params as constants).
    from climate2weather_tpu.diffusion.long_sampler import sample_guided_long

    @jax.jit
    def run(params, y, noise, key):
        guidance = GaussianGuidance(A=A, y=y, std=0.1, gamma=7e-4, exact_grad=False)
        return sample_guided_long(
            process,
            eps_fn,
            params,
            noise,
            markov_order=markov_order,
            chunk_size=chunk,
            guidance=guidance,
            steps=steps,
            corrections=0,
            rng=key,
        )

    noise = jax.random.normal(
        jax.random.fold_in(rng, 2), (L, num_features, res, res)
    )
    key = jax.random.fold_in(rng, 3)

    # warmup (compile)
    out, nan = run(params, y, noise, key)
    _sync(out)

    n_iters = 3
    t0 = time.time()
    for i in range(n_iters):
        out, nan = run(params, y, noise, jax.random.fold_in(key, i))
        _sync(out)
    dt = time.time() - t0

    total_evals = n_iters * steps * n_windows
    evals_per_sec = total_evals / dt
    n_chips = jax.device_count()
    evals_per_sec_chip = evals_per_sec / n_chips

    # second north-star: measured hours to downscale the 2014 year.
    # Defensive: a failure here (e.g. HBM pressure from a concurrent job)
    # must not cost the headline metric.
    try:
        year = measure_year_sampler(
            process, eps_fn, params, A, num_features, res, markov_order
        )
    except Exception as e:
        print(f"# year-scale measurement failed: {type(e).__name__}: {e}")
        year = None
    if year is not None and any(v <= 0 for v in year.values()):
        # warm-step differencing gone negative = timing noise, not a result
        print(f"# year-scale timing not credible, dropping: {year}")
        year = None
    # multi-device window-sharding overhead on the virtual CPU mesh
    overhead_pct = (
        None if os.environ.get("C2W_BENCH_NO_SCALING") else measure_scaling_overhead()
    )

    print(
        json.dumps(
            {
                "metric": "sampler net-evals/sec/chip",
                "value": round(evals_per_sec_chip, 2),
                "unit": f"window-evals/s ({n_params/1e6:.1f}M-param UNet, "
                f"[{chunk},{res},{res},{mdl['channels']}] bf16, "
                f"{jax.devices()[0].device_kind})",
                "vs_baseline": round(
                    evals_per_sec_chip / A100_BASELINE_EVALS_PER_SEC, 3
                ),
                # null (valid JSON), not NaN, when the year measurement failed
                "year2014_hours_per_sample_pc256": (
                    round(year["pc256_hours"], 3) if year else None
                ),
                "year2014_hours_per_sample_dpmpp64": (
                    round(year["dpm64_hours"], 3) if year else None
                ),
                "year_vs_baseline_speedup_pc256": (
                    round(A100_BASELINE_YEAR_HOURS / year["pc256_hours"], 2)
                    if year and year["pc256_hours"] > 0
                    else None
                ),
                "window_sharding_overhead_pct_8dev": overhead_pct,
            }
        )
    )


if __name__ == "__main__":
    main()
