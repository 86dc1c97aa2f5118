"""Fused single-head self-attention as a Pallas TPU kernel.

Semantics match the reference QKVAttention (model/nn.py:62-85): pre-scale q
and k by ch^-1/4 each (fp16/bf16-stable), softmax in fp32, weighted sum of v.
The production workload is tiny-sequence attention — 64 spatial tokens at 512
channels on the UNet's level 4 — so the whole (T, C) tile fits VMEM and one
kernel instance handles one batch element: no KV blocking or online softmax
needed; the win is fusing three ops (QK^T, softmax, PV) into one VMEM-resident
kernel with a single HBM round-trip.

A custom VJP recomputes the softmax in the backward kernel (standard
recompute formula), so the op is usable in training too.

Falls back to the jnp composition on non-TPU backends (tests run the kernel
in interpreter mode for bit-accuracy checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _attn_fwd_kernel(q_ref, k_ref, v_ref, o_ref):
    # [T, C] tiles; fp32 compute throughout the kernel
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    ch = q.shape[-1]
    scale = ch ** (-0.25)
    logits = jnp.dot(q * scale, (k * scale).T, preferred_element_type=jnp.float32)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[:] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref, k_ref, v_ref, do_ref, dq_ref, dk_ref, dv_ref):
    q = q_ref[:].astype(jnp.float32)
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    do = do_ref[:].astype(jnp.float32)
    ch = q.shape[-1]
    scale = ch ** (-0.25)
    # recompute softmax
    logits = jnp.dot(q * scale, (k * scale).T, preferred_element_type=jnp.float32)
    logits = logits - jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits)
    p = e / jnp.sum(e, axis=-1, keepdims=True)  # [T, S]
    # dV = P^T dO
    dv_ref[:] = jnp.dot(p.T, do, preferred_element_type=jnp.float32).astype(
        dv_ref.dtype
    )
    # dP = dO V^T ; dS = P * (dP - rowsum(dP * P))
    dp = jnp.dot(do, v.T, preferred_element_type=jnp.float32)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    # dQ = dS K * scale^2 ; dK = dS^T Q * scale^2  (both q,k were pre-scaled)
    s2 = scale * scale
    dq_ref[:] = (jnp.dot(ds, k, preferred_element_type=jnp.float32) * s2).astype(
        dq_ref.dtype
    )
    dk_ref[:] = (jnp.dot(ds.T, q, preferred_element_type=jnp.float32) * s2).astype(
        dk_ref.dtype
    )


def _call_fwd(q, k, v, interpret: bool):
    b, t, c = q.shape
    return pl.pallas_call(
        _attn_fwd_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((None, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((None, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (None, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        interpret=interpret,
    )(q, k, v)


def _call_bwd(q, k, v, do, interpret: bool):
    b, t, c = q.shape
    spec = pl.BlockSpec((None, t, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _attn_bwd_kernel,
        grid=(b,),
        in_specs=[spec] * 4,
        out_specs=(spec, spec, spec),
        out_shape=(
            jax.ShapeDtypeStruct(q.shape, q.dtype),
            jax.ShapeDtypeStruct(k.shape, k.dtype),
            jax.ShapeDtypeStruct(v.shape, v.dtype),
        ),
        interpret=interpret,
    )(q, k, v, do)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, interpret: bool = False):
    """softmax((q*s)(k*s)^T) v with s = C^-1/4 and fp32 softmax.

    q, k, v: [B, T, C] single-head tensors; returns [B, T, C] in q.dtype.
    """
    return _call_fwd(q, k, v, interpret)


def _fwd(q, k, v, interpret):
    return _call_fwd(q, k, v, interpret), (q, k, v)


def _bwd(interpret, res, do):
    q, k, v = res
    dq, dk, dv = _call_bwd(q, k, v, do, interpret)
    return dq, dk, dv


fused_attention.defvjp(_fwd, _bwd)


def reference_attention(q, k, v):
    """jnp composition with identical semantics (the XLA fallback and the
    test oracle)."""
    ch = q.shape[-1]
    scale = ch ** (-0.25)
    logits = jnp.einsum(
        "btc,bsc->bts",
        (q * scale).astype(jnp.float32),
        (k * scale).astype(jnp.float32),
    )
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bts,bsc->btc", p.astype(v.dtype), v).astype(q.dtype)
