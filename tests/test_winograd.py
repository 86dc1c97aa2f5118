"""Winograd F(2x2, 3x3) fused conv kernel (ops/winograd.py).

Runs the Pallas kernel in interpreter mode on the CPU test mesh; fp32 cases
must match the XLA direct conv to float tolerance (the F(2,3) transforms are
exact in fp32), and the custom VJP must match autodiff through the XLA
composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from climate2weather_tpu.ops import winograd as W


def _mk(n=2, h=16, w=8, c=8, o=12, seed=0):
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.randn(n, h, w, c).astype(np.float32))
    k = jnp.asarray((rng.randn(3, 3, c, o) * 0.1).astype(np.float32))
    b = jnp.asarray(rng.randn(o).astype(np.float32))
    return x, k, b, rng


@pytest.mark.parametrize("h,w", [(16, 8), (32, 16), (8, 32), (4, 6)])
def test_matches_xla_conv_fp32(h, w):
    # covers single- and multi-row-block grids and the TY fallbacks
    x, k, b, _ = _mk(h=h, w=w)
    out = W.winograd_conv3x3(x, k, b, None, None, None, 0, True)
    ref = W._conv_ref(x, k, b)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.parametrize("pre", [None, "norm", "silu"])
@pytest.mark.parametrize("ddof", [0, 1])
def test_fused_pre_vec_residual(pre, ddof):
    x, k, b, rng = _mk(h=32, w=16)
    vec = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    res = jnp.asarray(rng.randn(2, 32, 16, 12).astype(np.float32))
    out = W.winograd_conv3x3(x, k, b, vec, res, pre, ddof, True)
    ref = res + W._conv_ref(W._apply_pre(x, vec, pre, ddof), k, b)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_mod_residual_block_composition():
    """conv0(norm(x+proj)) -> silu -> conv1 + x, as two fused kernel calls,
    equals the models/unet.py ModResidualBlock composition."""
    x, k0, b0, rng = _mk(h=16, w=16, c=8, o=8)
    k1 = jnp.asarray((rng.randn(3, 3, 8, 8) * 0.1).astype(np.float32))
    b1 = jnp.asarray(rng.randn(8).astype(np.float32))
    proj = jnp.asarray(rng.randn(2, 8).astype(np.float32))

    h = W.winograd_conv3x3(x, k0, b0, proj, None, "norm", 0, True)
    out = W.winograd_conv3x3(h, k1, b1, None, x, "silu", 0, True)

    from climate2weather_tpu.models.unet import channel_norm

    hr = channel_norm(x + proj[:, None, None, :])
    hr = W._conv_ref(hr, k0, b0)
    hr = jax.nn.silu(hr)
    ref = x + W._conv_ref(hr, k1, b1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_vjp_matches_autodiff():
    x, k, b, rng = _mk(h=16, w=8)
    vec = jnp.asarray(rng.randn(2, 8).astype(np.float32))
    res = jnp.asarray(rng.randn(2, 16, 8, 12).astype(np.float32))

    def loss_w(x_, k_, b_, v_, r_):
        return jnp.sum(W.winograd_conv3x3(x_, k_, b_, v_, r_, "norm", 0, True) ** 2)

    def loss_r(x_, k_, b_, v_, r_):
        return jnp.sum((r_ + W._conv_ref(W._apply_pre(x_, v_, "norm", 0), k_, b_)) ** 2)

    gw = jax.grad(loss_w, argnums=(0, 1, 2, 3, 4))(x, k, b, vec, res)
    gr = jax.grad(loss_r, argnums=(0, 1, 2, 3, 4))(x, k, b, vec, res)
    for a, c in zip(gw, gr):
        np.testing.assert_allclose(a, c, atol=2e-3, rtol=1e-4)


def test_weight_transform_identity():
    """U = G g G^T reproduces the conv on a delta image exactly: the conv of
    a centered delta returns the flipped kernel, winograd included."""
    c, o = 4, 4
    rng = np.random.RandomState(1)
    k = jnp.asarray((rng.randn(3, 3, c, o)).astype(np.float32))
    x = jnp.zeros((1, 8, 8, c), jnp.float32).at[0, 3, 3, :].set(1.0)
    out = W.winograd_conv3x3(x, k, jnp.zeros(o), None, None, None, 0, True)
    ref = W._conv_ref(x, k, jnp.zeros(o))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_bf16_error_bound():
    """bf16 inputs: the extra transform roundings must stay within a few ulp
    of the direct bf16 XLA conv (the dtype the production UNet runs in)."""
    x, k, b, _ = _mk(n=2, h=32, w=16, c=32, o=32, seed=3)
    xb = x.astype(jnp.bfloat16)
    out = W.winograd_conv3x3(xb, k, b, None, None, None, 0, True)
    assert out.dtype == jnp.bfloat16
    ref = W._conv_ref(xb, k, b).astype(jnp.float32)
    exact = W._conv_ref(x, k, b)
    wino_err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - exact)))
    conv_err = float(jnp.max(jnp.abs(ref - exact)))
    # winograd-bf16 may be at most ~4x the direct conv's own bf16 rounding
    assert wino_err <= 4.0 * conv_err + 1e-6, (wino_err, conv_err)


def test_eligibility():
    assert W.winograd_eligible((2, 16, 8, 4), 3, (1, 1), 2)
    # the tuple/list forms the UNet call sites actually construct
    assert W.winograd_eligible((2, 16, 8, 4), (3, 3), [1, 1], 2)
    assert W.winograd_eligible((2, 16, 8, 4), 3, None, 2)
    assert W.winograd_eligible((2, 16, 8, 4), 3, 1, 2)
    assert not W.winograd_eligible((2, 15, 8, 4), 3, (1, 1), 2)  # odd H
    assert not W.winograd_eligible((2, 16, 8, 4), 3, (2, 2), 2)  # strided
    assert not W.winograd_eligible((2, 16, 8, 4), 3, 2, 2)  # strided int
    assert not W.winograd_eligible((2, 16, 8, 4), 5, (1, 1), 2)  # 5x5
    assert not W.winograd_eligible((2, 16, 8, 4), 3, (1, 1), 3)  # 3-D
