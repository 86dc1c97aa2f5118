"""Benchmark: guided-sampler net-evals/sec/chip on the flagship model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Workload (BASELINE.md): the production ~72M-param sda_unet
(configs/sda_unet.yml) evaluating Markov-blanket windows of
[batch<=128, 128, 128, 52] inside the guided PC sampler — the unit of the
reference's sampler cost model (SURVEY.md §3.2: year run = 2.23M
window-evals/sample executed as 17.7k batch-forwards).

We time the real end-to-end guided sampler (jitted scan: window gather ->
UNet -> fold -> analytic likelihood guidance -> predictor step) on a
trajectory sized to give an integer number of full window chunks, and
report window-evaluations per second per chip.

Baseline: the reference publishes no numbers (BASELINE.md), so
``vs_baseline`` is measured against an analytic A100 estimate of the
reference implementation documented below:

  FLOPs/window-eval (fwd): 113 GFLOP from XLA cost analysis (measured)
  A100 dense fp16 peak: 312 TFLOPS; assumed 35% MFU for this conv/attention
  UNet under torch fp16-mixed -> ~109 TFLOPS -> ~1.0k evals/s net-only.
  Reference pipeline overheads (torch.func.jacrev with chunk_size=1 through
  fold/unfold + CPU<->GPU window streaming each chunk,
  src/thor/score.py:28-35,165-183) conservatively halve that -> 520 evals/s.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import yaml

A100_BASELINE_EVALS_PER_SEC = 520.0


def main():
    from climate2weather_tpu.diffusion.guidance import (
        GaussianGuidance,
        SpatioTemporalCoarsening,
    )
    from climate2weather_tpu.diffusion.process import VPCosineProcess
    from climate2weather_tpu.diffusion.sampler import sample as pc_sample
    from climate2weather_tpu.diffusion.window import (
        WindowScoreFn,
        make_batched_eps_fn,
    )
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

    def sync(arr):
        # force completion with a real device->host fetch:
        # block_until_ready does not block under remote-relay execution
        return float(jnp.asarray(arr).ravel()[0])

    # warmup (compile)
    out, nan = run(params, y, noise, key)
    sync(out)

    n_iters = 3
    t0 = time.time()
    for i in range(n_iters):
        out, nan = run(params, y, noise, jax.random.fold_in(key, i))
        sync(out)
    dt = time.time() - t0

    total_evals = n_iters * steps * n_windows
    evals_per_sec = total_evals / dt
    n_chips = jax.device_count()
    evals_per_sec_chip = evals_per_sec / n_chips

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
            }
        )
    )


if __name__ == "__main__":
    main()
