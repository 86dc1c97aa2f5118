"""Ensemble-batched sampling sharded over the 8-device mesh with a batch
size NOT divisible by the mesh (the shipped storm-eval tip is
``ensemble_batch: 3`` — reference exp/configs/000_on-model-eval/s16_t6.yml):
the driver must pad the run batch to a mesh multiple and slice the
duplicates off (VERDICT r1, weak #1)."""

import os

import numpy as np
import pytest
import yaml


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    import jax
    import jax.numpy as jnp

    from climate2weather_tpu.data.grid import GridDataset
    from climate2weather_tpu.data.processing import (
        compute_quantiles,
        merged_to_normed_h5,
    )
    from climate2weather_tpu.models.score_net import build_score_unet
    from climate2weather_tpu.training.checkpoint import save_snapshot

    root = tmp_path_factory.mktemp("ensemble")
    rng = np.random.RandomState(0)
    t, res = 24, 16
    time = np.datetime64("2014-01-01T00", "ns") + np.arange(t) * np.timedelta64(1, "h")
    ds = GridDataset(
        {
            v: (np.cumsum(rng.randn(t, res, res), axis=0) * 0.1 + i).astype(np.float32)
            for i, v in enumerate(("psl", "tas", "uas", "vas"))
        },
        {"time": time, "rlat": np.linspace(-2, 2, res), "rlon": np.linspace(0, 4, res)},
    )
    ds.to_file(str(root / "merged.nc"))
    compute_quantiles(ds).to_file(str(root / "quantiles.nc"))
    merged_to_normed_h5(
        str(root / "merged.nc"), str(root / "quantiles.nc"), str(root / "train.h5")
    )

    # hand-built snapshot: random params, no training needed for a shape/
    # sharding test
    window = 3
    network_kwargs = dict(
        channels=4 * window,
        embedding_dim=32,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        attention_levels=(),
    )
    net = build_score_unet(network_kwargs, dtype=jnp.float32)
    params = net.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, res, res, 4 * window)),
        jnp.ones((1,)),
    )
    snap_config = {
        "network_kwargs": network_kwargs,
        "dataset_kwargs": {"train": {"window": window}},
        "pipeline_kwargs": {"class_name": "vp_cosine"},
    }
    run_dir = str(root / "run")
    os.makedirs(run_dir, exist_ok=True)
    snap = save_snapshot(run_dir, 1, "0.999900", params, snap_config)
    return root, snap


def test_eb3_sharded_on_8_devices(workspace):
    import jax

    assert jax.device_count() == 8
    root, snap = workspace
    from climate2weather_tpu.exp import downscaling

    cfg = dict(
        model_path=snap,
        data_path=str(root / "merged.nc"),
        quantile_path=str(root / "quantiles.nc"),
        start_time="2014-01-01-00",
        num_hours=9,
        data_norm_mode="quant95",
        observation_path=str(root / "merged.nc"),
        data_vars=["psl", "tas", "uas", "vas"],
        num_sampling_steps=2,
        num_samples=4,  # 1 full group of 3 + partial tail group of 1
        num_corrections=0,
        likelihood_std=0.1,
        likelihood_gamma=1e-3,
        t_step=3,
        s_step=4,
        batch_size=4,
        seed=0,
        use_exact_grad=False,
        ensemble_batch=3,  # NOT divisible by the 8-device mesh
    )
    cfg_path = str(root / "eb3.yml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    exp_dir = downscaling.run(str(root / "eb3_out"), cfg_path)
    files = sorted(os.listdir(exp_dir))
    gens = [f for f in files if f.startswith("gen_sample_")]
    assert gens == [f"gen_sample_{i:03d}.nc" for i in range(4)], files

    # distinct seeds -> distinct samples (padding/tiling must not leak
    # duplicated outputs into the saved ids)
    from climate2weather_tpu.data.grid import open_grid

    arrs = [open_grid(str(exp_dir / g)).data_vars["tas"] for g in gens]
    for i in range(len(arrs)):
        for j in range(i + 1, len(arrs)):
            assert not np.allclose(arrs[i], arrs[j]), (i, j)
        assert np.isfinite(arrs[i]).all()
