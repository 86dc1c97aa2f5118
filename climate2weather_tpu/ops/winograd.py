"""Fused Winograd F(2x2, 3x3) convolution as a Pallas TPU kernel.

Drop-in replacement for the UNet's stride-1 SAME 3x3 convolutions
(models/unet.py ModResidualBlock conv0/conv1; reference model/nn.py:146-159)
computing the mathematically identical convolution with 2.25x fewer
multiply-accumulates: 16 element-wise-multiply planes per 2x2 output tile
instead of 36 direct MACs.

STATUS — measured, NOT the production path (see ops/README.md "Round-3
headroom investigation"): this was the one remaining algorithmic lever after
int8 and window-amortization were measured out.  The theory: Winograd trades
MXU FLOPs for VPU adds — the F(2,3) transforms use only {0, +-1}
coefficients (B^T and A^T), ~18 VPU adds per output pixel to remove 20 MXU
MACs — and fusing the transforms in VMEM avoids the 4x-size HBM
intermediates that sink the unfused formulation.  The measurement: at the
production L0 shape ([128,128,128,128] @ 128ch) the fused kernel runs
16.4 ms/conv vs 9.3-10.1 ms for a standalone XLA conv (and ~4.2 ms effective
for the same conv inside the compiled UNet) — the kernel is VPU-issue-bound:
the transform/inverse add chains cost ~12 us of VPU work per row-block
against the 2.4 us of MXU time the 2.25x MAC reduction saves, so on this
chip's VPU:MXU throughput ratio the trade cannot pay at C=128.  Kept as an
exact, property-tested op (the same policy as models/unet.py
NearestUpConv2x) and as the concluding record of the headroom hunt.

Fusion surface: replacing an XLA conv with a Pallas call would break XLA's
epilogue/prologue fusion of the surrounding element-wise ops and re-buy the
HBM round-trips the fusion saved.  So the kernel optionally absorbs the full
ModResidualBlock element-wise chain:

- ``pre='norm'``  : per-pixel channel standardization of the input (fp32
  statistics; matches models/unet.py channel_norm incl. ``ddof``), with an
  optional per-image channel bias added first (the block's
  ``project(emb)`` modulation) — the input side of conv0.
- ``pre='silu'``  : SiLU on the input — the input side of conv1.
- ``residual=...``: a same-shape tensor added to the output — the block's
  skip connection, fused as an epilogue.

Zero extra HBM materialization for halos: the row-block's one-row top/bottom
halo is fetched by passing the *same* input array under three BlockSpecs
whose index maps address the neighbouring rows (clamped at the edges and
masked to zero in-kernel).  Column padding, parity splits and transforms all
happen on VMEM values.

Layout: NHWC with C on the lane dimension; the plane matmuls are
[tiles, C] @ [C, O] jnp.dot calls with fp32 accumulation, which is exactly
the MXU-shaped contraction.  Weights are pre-transformed once per call
(U = G g G^T, fp32, tiny) and broadcast to every grid step.

Backward: the op *is* the 3x3 convolution, so the custom VJP uses the
standard analytic conv adjoints as XLA convs (input-rotated kernel for dx,
batch-contracting conv for dw) — exact, and XLA's conv backward already runs
at the roof so there is nothing to win from a Pallas backward.

Numerics: B^T/A^T coefficients are exactly representable; the weight
transform runs in fp32.  In bf16 the extra input-transform roundings add
~1-2 ulp over XLA's direct bf16 conv (tested bound in
tests/test_winograd.py); in fp32 the kernel matches XLA conv to ~1e-5.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# F(2x2, 3x3) transform matrices (Lavin & Gray, 2016).
_BT = np.array(
    [[1, 0, -1, 0], [0, 1, 1, 0], [0, -1, 1, 0], [0, 1, 0, -1]], np.float32
)
_G = np.array(
    [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], np.float32
)
_AT = np.array([[1, 1, 1, 0], [0, 1, -1, -1]], np.float32)


def transform_weights(kernel: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, C, O] conv kernel -> [16, C, O] Winograd-domain weights
    U[4i+j] = sum_ab G[i,a] G[j,b] K[a,b] (computed in fp32)."""
    k = kernel.astype(jnp.float32)
    u = jnp.einsum("ia,jb,abco->ijco", _G, _G, k)
    return u.reshape(16, *k.shape[2:])


def _channel_norm_val(x, eps: float, ddof: int):
    # single source of truth for the norm the fused op must match exactly
    from climate2weather_tpu.models.unet import channel_norm

    return channel_norm(x, eps=eps, ddof=ddof)


def _wino_kernel(
    *refs,
    pre: Optional[str],
    has_vec: bool,
    has_res: bool,
    ty: int,
    w: int,
    ddof: int,
):
    """One grid step: rows [16k*ty-ish] of one image, full width."""
    it = iter(refs)
    main_ref, top_ref, bot_ref = next(it), next(it), next(it)
    vec_ref = next(it) if has_vec else None
    u_ref, b_ref = next(it), next(it)
    res_ref = next(it) if has_res else None
    out_ref = next(it)

    kb = pl.program_id(1)
    nb = pl.num_programs(1)

    top = top_ref[:]  # [1, W, C] (clamped row; masked below at the edge)
    bot = bot_ref[:]
    x18 = jnp.concatenate([top, main_ref[:], bot], axis=0)  # [2ty+2, W, C]

    if has_vec:
        x18 = x18 + vec_ref[:].astype(x18.dtype)  # [1, C] broadcast
    if pre == "norm":
        x18 = _channel_norm_val(x18, 1e-5, ddof)
    elif pre == "silu":
        # explicit fp32 silu: jax.nn.silu's bf16 lowering trips a Mosaic
        # f32-scalar->bf16-vector broadcast verification error
        x32 = x18.astype(jnp.float32)
        x18 = (x32 * jax.lax.logistic(x32)).astype(x18.dtype)

    # zero the halo rows at the image edges (= the conv's zero padding)
    zero_row = jnp.zeros_like(x18[:1])
    x18 = jnp.concatenate(
        [jnp.where(kb == 0, zero_row, x18[:1]), x18[1:]], axis=0
    )
    x18 = jnp.concatenate(
        [x18[:-1], jnp.where(kb == nb - 1, zero_row, x18[-1:])], axis=0
    )
    # zero column padding
    xp = jnp.pad(x18, ((0, 0), (1, 1), (0, 0)))  # [2ty+2, W+2, C]

    # parity split: rows even/odd, then columns even/odd.  Mosaic does not
    # support stride-2 slices, so both splits are memory-order-preserving
    # reshapes followed by unit slices: rows split on an outer dim (free),
    # columns via a sublane-splitting reshape (a vector relayout).
    c = xp.shape[-1]
    rows, cols = xp.shape[0], xp.shape[1]
    xr = xp.reshape(rows // 2, 2, cols, c)
    xe, xo = xr[:, 0], xr[:, 1]  # [ty+1, W+2, C]
    half = cols // 2  # W/2 + 1

    def colsplit(a):
        ar = a.reshape(a.shape[0], half, 2, c)
        return ar[:, :, 0], ar[:, :, 1]  # each [ty+1, half, C]

    xee, xeo = colsplit(xe)
    xoe, xoo = colsplit(xo)
    par = {(0, 0): xee, (0, 1): xeo, (1, 0): xoe, (1, 1): xoo}
    tx = w // 2  # output tile columns

    def d(p, q):  # window-position (p, q) view: [ty, tx, C]
        a = par[(p % 2, q % 2)]
        return jax.lax.slice(
            a, (p // 2, q // 2, 0), (p // 2 + ty, q // 2 + tx, c)
        )

    # V = B^T d B, two stages of {0,+-1} combinations (rows then columns)
    t_iq = {}
    for q in range(4):
        d0, d1, d2, d3 = d(0, q), d(1, q), d(2, q), d(3, q)
        t_iq[(0, q)] = d0 - d2
        t_iq[(1, q)] = d1 + d2
        t_iq[(2, q)] = d2 - d1
        t_iq[(3, q)] = d1 - d3

    n_tiles = ty * tx
    o = u_ref.shape[-1]
    # s[u][j] = sum_i AT[u, i] M[i][j], accumulated as each plane's matmul
    # retires (A^T entries are {0, +-1}); M[i][j] = V[i][j] @ U[4i+j], fp32.
    s = [[None] * 4 for _ in range(2)]
    for i in range(4):
        for j in range(4):
            if j == 0:
                v = t_iq[(i, 0)] - t_iq[(i, 2)]
            elif j == 1:
                v = t_iq[(i, 1)] + t_iq[(i, 2)]
            elif j == 2:
                v = t_iq[(i, 2)] - t_iq[(i, 1)]
            else:
                v = t_iq[(i, 1)] - t_iq[(i, 3)]
            m = jnp.dot(
                v.reshape(n_tiles, c),
                u_ref[4 * i + j],
                preferred_element_type=jnp.float32,
            )
            for u_i, coef in ((0, _AT[0, i]), (1, _AT[1, i])):
                if coef == 0:
                    continue
                contrib = m if coef > 0 else -m
                s[u_i][j] = contrib if s[u_i][j] is None else s[u_i][j] + contrib

    bias = b_ref[:].astype(out_ref.dtype)  # [1, O]
    res = res_ref[:] if has_res else None
    out_rows = []
    for u_i in range(2):
        y0 = s[u_i][0] + s[u_i][1] + s[u_i][2]  # v = 0
        y1 = s[u_i][1] - s[u_i][2] - s[u_i][3]  # v = 1
        # [tiles, O] -> [ty, tx, O]; interleave column parity -> [ty, W, O]
        y0 = y0.astype(out_ref.dtype).reshape(ty, tx, o)
        y1 = y1.astype(out_ref.dtype).reshape(ty, tx, o)
        yr = jnp.stack([y0, y1], axis=2).reshape(ty, w, o)
        out_rows.append(yr)
    # interleave row parity -> [2*ty, W, O]
    y = jnp.stack(out_rows, axis=1).reshape(2 * ty, w, o)
    y = y + bias[None]
    if has_res:
        y = y + res.astype(y.dtype)
    out_ref[:] = y


def _pick_ty(h: int) -> int:
    for t in (8, 4, 2, 1):
        if h % (2 * t) == 0:
            return t
    raise ValueError(f"height {h} not even")


@functools.partial(
    jax.jit, static_argnames=("pre", "ddof", "interpret")
)
def _wino_call(x, u, bias2d, vec3d, res, *, pre, ddof, interpret):
    n, h, w, c = x.shape
    o = u.shape[-1]
    ty = _pick_ty(h)
    if res is not None and ty == 8:
        # the extra residual block operand pushes the TY=8 working set just
        # past the 16 MB VMEM limit — halve the row-block (smaller TYs fit)
        ty //= 2
    rb = 2 * ty
    nb = h // rb
    has_vec = vec3d is not None
    has_res = res is not None

    kern = functools.partial(
        _wino_kernel, pre=pre, has_vec=has_vec, has_res=has_res,
        ty=ty, w=w, ddof=ddof,
    )
    vm = pltpu.VMEM
    in_specs = [
        pl.BlockSpec((None, rb, w, c), lambda i, k: (i, k, 0, 0), memory_space=vm),
        pl.BlockSpec(
            (None, 1, w, c),
            lambda i, k: (i, jnp.maximum(rb * k - 1, 0), 0, 0),
            memory_space=vm,
        ),
        pl.BlockSpec(
            (None, 1, w, c),
            lambda i, k: (i, jnp.minimum(rb * k + rb, h - 1), 0, 0),
            memory_space=vm,
        ),
    ]
    args = [x, x, x]
    if has_vec:
        in_specs.append(
            pl.BlockSpec((None, 1, c), lambda i, k: (i, 0, 0), memory_space=vm)
        )
        args.append(vec3d)
    in_specs.append(pl.BlockSpec((16, c, o), lambda i, k: (0, 0, 0), memory_space=vm))
    in_specs.append(pl.BlockSpec((1, o), lambda i, k: (0, 0), memory_space=vm))
    args += [u, bias2d]
    if has_res:
        in_specs.append(
            pl.BlockSpec((None, rb, w, o), lambda i, k: (i, k, 0, 0), memory_space=vm)
        )
        args.append(res)

    return pl.pallas_call(
        kern,
        grid=(n, nb),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (None, rb, w, o), lambda i, k: (i, k, 0, 0), memory_space=vm
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, o), x.dtype),
        interpret=interpret,
    )(*args)


def _conv_ref(x, kernel, bias):
    """XLA direct conv with identical semantics (oracle + VJP building block)."""
    dn = jax.lax.conv_dimension_numbers(
        x.shape, kernel.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=dn, preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + bias.astype(x.dtype)


def _apply_pre(x, vec, pre, ddof):
    if vec is not None:
        x = x + vec[:, None, None, :].astype(x.dtype)
    if pre == "norm":
        x = _channel_norm_val(x, 1e-5, ddof)
    elif pre == "silu":
        x = jax.nn.silu(x)
    return x


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(5, 6, 7)
)
def winograd_conv3x3(x, kernel, bias, vec, residual, pre=None, ddof=0,
                     interpret=False):
    """``residual + conv3x3_same(pre(x + vec), kernel) + bias`` fused.

    x: [N, H, W, C] (H even); kernel: [3, 3, C, O] fp32; bias: [O] fp32;
    vec: optional [N, C] per-image channel modulation added before ``pre``;
    residual: optional [N, H, W, O] epilogue addend; pre in {None, 'norm',
    'silu'} (``'norm'`` = channel_norm with ``ddof``).  Returns x.dtype.
    """
    u = transform_weights(kernel).astype(x.dtype)
    vec3d = None if vec is None else vec[:, None, :]
    return _wino_call(
        x, u, bias.astype(jnp.float32)[None], vec3d, residual,
        pre=pre, ddof=ddof, interpret=interpret,
    )


def _wino_fwd(x, kernel, bias, vec, residual, pre, ddof, interpret):
    out = winograd_conv3x3(x, kernel, bias, vec, residual, pre, ddof, interpret)
    # the 4th residual is a structure-only marker (() vs None) for whether a
    # residual input existed — pytree STRUCTURE is static under tracing
    return out, (x, kernel, vec, None if residual is None else ())


def _wino_bwd(pre, ddof, interpret, saved, g):
    """Analytic conv adjoints through the fused element-wise chain, as XLA
    ops (XLA's conv backward already runs at the roof; recompute the cheap
    pre-activation instead of saving it)."""
    x, kernel, vec, res_marker = saved
    had_res = res_marker is not None

    def f(x_, kernel_, bias_, vec_):
        h = _apply_pre(x_, vec_, pre, ddof)
        return _conv_ref(h, kernel_, bias_)

    # Differentiate the mathematically identical XLA composition.  The
    # conv/elementwise grads are exact; fp differences vs the forward kernel
    # are the usual Winograd rounding (bounded in tests).
    zero_b = jnp.zeros((kernel.shape[-1],), jnp.float32)
    if vec is None:
        _, vjp = jax.vjp(lambda a, k_, b_: f(a, k_, b_, None), x, kernel, zero_b)
        dx, dk, db = vjp(g)
        dvec = None
    else:
        _, vjp = jax.vjp(f, x, kernel, zero_b, vec)
        dx, dk, db, dvec = vjp(g)
    return dx, dk, db, dvec, (g if had_res else None)


winograd_conv3x3.defvjp(_wino_fwd, _wino_bwd)


def winograd_eligible(x_shape, kernel_size, strides, spatial) -> bool:
    """The kernel covers stride-1 SAME 3x3 2-D convs with even H and W."""
    if spatial != 2 or kernel_size not in (3, (3, 3)):
        return False
    if strides is not None:
        s = (strides, strides) if isinstance(strides, int) else tuple(strides)
        if s != (1, 1):
            return False
    _, h, w, _ = x_shape
    return h % 2 == 0 and w % 2 == 0
