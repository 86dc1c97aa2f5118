"""Training CLI — config assembly and launch.

Parity: reference ``train.py`` (train.py:37-245): click CLI with ndata
Ki/Mi/Gi suffix parsing, run-dir setup with frozen ``opts.yaml`` /
``config.yaml``, and the EasyDict config surface (dataset / network /
optimizer / pipeline / EMA / LR kwargs by component name) handed to the
training loop.  Device/strategy flags are replaced by the JAX mesh: data
parallelism is automatic over all visible devices; multi-host runs call
``jax.distributed.initialize`` when JAX_COORDINATOR_ADDRESS is set.
"""

from __future__ import annotations

import os

import click
import yaml

from climate2weather_tpu.parallel.mesh import configure_platform, maybe_init_distributed
from climate2weather_tpu.utils.easydict import EasyDict
from climate2weather_tpu.utils.ndata import parse_ndata


def _parse_ndata_cb(ctx, param, value):
    return parse_ndata(value) if value is not None else None


# fmt: off
@click.command()
# Device flags of the reference CLI, accepted for drop-in compatibility but
# ignored: the JAX runtime discovers devices (multi-host pods set
# JAX_COORDINATOR_ADDRESS).
@click.option('--accelerator',   'accelerator',  type=str, default=None, hidden=True)
@click.option('--devices',       'devices',      type=int, default=None, hidden=True)
@click.option('--num-nodes',     'num_nodes',    type=int, default=None, hidden=True)
@click.option('--strategy',      'strategy',     type=str, default=None, hidden=True)
# General
@click.option('--run-dir',       'run_dir',      type=str, required=True, help='Where to save the results')
@click.option('--run-id',        'run_id',       type=str, required=True, help='Unique identifier for the run')
@click.option('--desc',          'desc',         type=str, default=None, help='String to include in result dir name')
# Data
@click.option('--train-data',    'train_data',   type=str, required=True, help='Path to the training .h5 dataset')
@click.option('--valid-data',    'valid_data',   type=str, default=None, help='Path to the validation dataset')
@click.option('--spatial-res',   'spatial_res',  type=click.IntRange(min=4), required=True)
@click.option('--num-features',  'num_features', type=click.IntRange(min=1), required=True)
@click.option('--cache-data/--no-cache-data',    'cache_data', default=False, show_default=True)
# Model
@click.option('--markov-order',  'markov_order', type=click.IntRange(min=1), default=3, show_default=True)
@click.option('--model-config',  'model_config', type=str, default='configs/sda_unet.yml', show_default=True)
# Training
@click.option('--lr',            'lr',           type=click.FloatRange(min=0.0, min_open=True), default=2e-4, show_default=True)
@click.option('--total-ndata',   'total_ndata',  callback=_parse_ndata_cb, default='15Mi', show_default=True)
@click.option('--batch',         'batch',        type=click.IntRange(min=1), default=128, show_default=True)
@click.option('--batch-gpu',     'batch_gpu',    type=click.IntRange(min=1), default=None, help='Per-device microbatch limit')
# Logging intervals (ndata)
@click.option('--status',        'status',       callback=_parse_ndata_cb, default='20Ki', show_default=True)
@click.option('--snapshot',      'snapshot',     callback=_parse_ndata_cb, default='1Mi', show_default=True)
@click.option('--checkpoint',    'checkpoint',   callback=_parse_ndata_cb, default='2Mi', show_default=True)
@click.option('--logging',       'logging_',     callback=_parse_ndata_cb, default='5Ki', show_default=True)
@click.option('--valid',         'valid',        callback=_parse_ndata_cb, default='1Mi', show_default=True)
@click.option('--slice-data',    'slice_data',   callback=_parse_ndata_cb, default=None)
@click.option('--seed',          'seed',         type=int, default=0, show_default=True)
@click.option('--ema-rates',     'ema_rates',    type=str, default='0.9999', show_default=True, help='Comma-separated EMA rates')
@click.option('--log-alldevices/--log-firstdevice', 'log_alldevices', default=False, show_default=True)
@click.option('--wandb/--no-wandb', 'use_wandb', default=False, show_default=True)
# fmt: on
def main(**opts):
    configure_platform()
    maybe_init_distributed()
    for flag in ("accelerator", "devices", "num_nodes", "strategy"):
        if opts.pop(flag, None) is not None:
            print(
                f"NOTE: --{flag.replace('_', '-')} is accepted for reference-CLI "
                f"compatibility but ignored (devices come from the JAX runtime)."
            )
    fabricless_main(**opts)


def fabricless_main(
    run_dir, run_id, desc, train_data, valid_data, spatial_res, num_features,
    cache_data, markov_order, model_config, lr, total_ndata, batch, batch_gpu,
    status, snapshot, checkpoint, logging_, valid, slice_data, seed, ema_rates,
    log_alldevices, use_wandb,
):
    import jax

    from climate2weather_tpu.training.loop import training_loop
    from climate2weather_tpu.utils.logging import RunLogger

    opts = EasyDict(locals())
    opts.pop("jax", None)

    # -- run dir + frozen opts (reference train.py:103-121) ----------------
    cur_run_dir = str(run_id) + (f"-{desc}" if desc else "")
    cur_run_dir = os.path.join(run_dir, cur_run_dir)
    if jax.process_index() == 0:
        os.makedirs(cur_run_dir, exist_ok=True)
        with open(os.path.join(cur_run_dir, "opts.yaml"), "w") as f:
            yaml.safe_dump(
                {k: v for k, v in opts.items() if not callable(v)}, f
            )

    # -- config assembly (reference train.py:128-196) ----------------------
    cfg = EasyDict()
    window = 2 * markov_order + 1
    common_dataset_kwargs = dict(
        class_name="cosmo_dataset",
        num_features=num_features,
        spatial_res=spatial_res,
        cached=cache_data,
        window=window,
        flatten=True,
    )
    cfg.dataset_kwargs = EasyDict()
    cfg.dataset_kwargs.train = EasyDict(data_path=train_data, **common_dataset_kwargs)
    if valid_data is not None:
        cfg.dataset_kwargs.valid = EasyDict(
            data_path=valid_data, **common_dataset_kwargs
        )

    cfg.total_ndata = total_ndata
    cfg.batch_size = batch
    cfg.batch_gpu = batch_gpu
    cfg.log_ndata = logging_
    cfg.valid_ndata = valid
    cfg.snapshot_ndata = snapshot
    cfg.checkpoint_ndata = checkpoint
    cfg.status_ndata = status
    cfg.slice_ndata = slice_data
    cfg.seed = seed

    with open(model_config) as yf:
        mdl_conf = yaml.safe_load(yf)
    # ignore torch-only keys from reference YAMLs (padding_mode etc.)
    cfg.network_kwargs = EasyDict(
        class_name="score_unet",
        channels=num_features * window,
        **{k: v for k, v in mdl_conf.items() if k != "padding_mode"},
    )

    cfg.optimizer_kwargs = EasyDict(
        class_name="adamw", lr=lr, weight_decay=1e-3, betas=[0.9, 0.999]
    )
    cfg.pipeline_kwargs = EasyDict(class_name="vp_cosine")
    cfg.ema_kwargs = EasyDict(
        class_name="standard_ema",
        rates=[float(r) for r in str(ema_rates).split(",")],
    )
    cfg.lr_kwargs = EasyDict(
        func_name="lr/linear", ref_lr=lr, total_ndata=total_ndata
    )
    cfg.run_dir = cur_run_dir

    if jax.process_index() == 0:
        with open(os.path.join(cur_run_dir, "config.yaml"), "w") as f:
            yaml.safe_dump(cfg.to_plain(), f)

    logger = RunLogger(
        cur_run_dir,
        enabled=log_alldevices or jax.process_index() == 0,
        use_wandb=use_wandb,
        run_id=f"{run_id}-{jax.process_index()}" if log_alldevices else run_id,
        config=cfg.to_plain(),
        rank=jax.process_index(),
    )

    training_loop(
        cur_run_dir,
        dataset_kwargs=cfg.dataset_kwargs,
        network_kwargs=cfg.network_kwargs,
        pipeline_kwargs=cfg.pipeline_kwargs,
        optimizer_kwargs=cfg.optimizer_kwargs,
        lr_kwargs=cfg.lr_kwargs,
        batch_size=cfg.batch_size,
        batch_gpu=cfg.batch_gpu,
        total_ndata=cfg.total_ndata,
        log_ndata=cfg.log_ndata,
        status_ndata=cfg.status_ndata,
        snapshot_ndata=cfg.snapshot_ndata,
        checkpoint_ndata=cfg.checkpoint_ndata,
        valid_ndata=cfg.valid_ndata,
        ema_kwargs=cfg.ema_kwargs,
        slice_ndata=cfg.slice_ndata,
        seed=cfg.seed,
        logger=logger,
    )
    logger.finish()
    print("Training complete.")


if __name__ == "__main__":
    main()
