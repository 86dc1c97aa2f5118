"""Test configuration: force an 8-device virtual CPU mesh.

The driver validates multi-chip sharding the same way (SURVEY.md §4):
``xla_force_host_platform_device_count`` gives N fake CPU devices so mesh /
pjit / collective code paths compile and execute without TPU hardware.
"""

import os

# Hard-set (not setdefault): the image exports JAX_PLATFORMS=axon (TPU), but
# tests must run on a virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402
import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The TPU plugin in this image registers itself regardless of the env var;
# the config update after import is what actually forces CPU.
jax.config.update("jax_platforms", "cpu")

# Exact fp32 matmuls for numerical tests: the default matmul precision on
# CPU/TPU reduces inputs to bf16-level, which is batch-size dependent (the
# backend picks different algorithms per shape) and would make
# chunked-vs-full comparisons fail spuriously.
jax.config.update("jax_default_matmul_precision", "highest")


@pytest.fixture
def rng():
    import jax

    return jax.random.PRNGKey(0)


@pytest.fixture
def tiny_net():
    """A tiny ScoreUNet (fp32 on CPU) plus initialized params."""
    import jax
    import jax.numpy as jnp

    from climate2weather_tpu.models import ScoreUNet

    C, window = 2, 5
    net = ScoreUNet(
        channels=C * window,
        embedding_dim=32,
        noise_features=8,
        hidden_channels=(8, 16),
        hidden_blocks=(1, 1),
        attention_levels=(1,),
        dtype=jnp.float32,
    )
    params = net.init(
        jax.random.PRNGKey(1),
        jnp.zeros((1, 16, 16, C * window)),
        jnp.ones((1,)),
    )
    return net, params, C, window


@pytest.fixture
def tiny_h5_4var(tmp_path):
    """A small [T=48, C=4, H=16, W=16] HDF5 training file (multi-host test)."""
    import h5py

    path = tmp_path / "train4.h5"
    rng = np.random.RandomState(1)
    x = rng.randn(48, 4, 16, 16).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("x", data=x)
        f.attrs["vars"] = ["psl", "tas", "uas", "vas"]
        f.attrs["norm_mode"] = "quant95"
    return str(path)


@pytest.fixture
def tiny_h5(tmp_path):
    """A small [T=20, C=2, H=16, W=16] HDF5 training file."""
    import h5py

    path = tmp_path / "train.h5"
    rng = np.random.RandomState(0)
    x = rng.randn(20, 2, 16, 16).astype(np.float32)
    with h5py.File(path, "w") as f:
        f.create_dataset("x", data=x)
        f.attrs["vars"] = ["tas", "uas"]
        f.attrs["norm_mode"] = "quant95"
    return str(path), x
