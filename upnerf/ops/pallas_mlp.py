"""Pallas TPU kernel: fused NeRF trunk (D dense+ReLU layers, skip concat).

The trunk dominates the train step (8 x [N, 256] @ [256, 256] matmuls per
NeRF evaluation). Under plain XLA every layer's activation round-trips HBM
(~0.5 GB per layer per model at the flagship batch). This kernel keeps the
whole layer chain in VMEM per row-tile:

  forward : one grid pass over row tiles; weights stay resident in VMEM
            (~2 MB for D=8, W=256); only the PE input tile is read and the
            final feature tile written.
  backward: custom VJP — recompute the activation chain for the tile in
            VMEM (flash-attention-style), then walk the layers in reverse
            accumulating dW/db into VMEM scratch across the sequential TPU
            grid, emitting dx.

Semantics match models/nerf.py:82-93: x0 = PE input; layer i has
input = concat(x0, h) when i in skips; ReLU after every layer.

Usage is optional: `fused_trunk(x, weights, skips)` is numerically
equivalent to the XLA path in upnerf.models.nerf (tested both ways);
select with NeRFConfig/tpu flags.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _layer_in_dim(i: int, in0: int, width: int, skips: Tuple[int, ...]) -> int:
    if i == 0:
        return in0
    if i in skips:
        return width + in0
    return width


def _dot(a, b, compute_dtype):
    if compute_dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    # f32 mode must REQUEST f32 MXU passes: inside Mosaic, dot precision
    # defaults to DEFAULT = one bf16 pass even for f32 operands, which
    # silently degraded precision='float32'/'high' (measured 18% gradient
    # divergence vs the XLA HIGHEST path on TPU).
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _fwd_kernel(
    x_ref, *refs, D: int, skips: Tuple[int, ...], out_dtype, compute_dtype
):
    # refs: W0, b0, ..., W_{D-1}, b_{D-1}, out_ref
    out_ref = refs[-1]
    x0 = x_ref[:]
    h = x0
    for i in range(D):
        w = refs[2 * i][:]
        b = refs[2 * i + 1][:]
        if i in skips and i > 0:
            h = jnp.concatenate([x0, h], axis=-1)
        h = jnp.maximum(_dot(h, w, compute_dtype) + b, 0.0)
    out_ref[:] = h.astype(out_dtype)


def _recompute_chain(x0, weights, D, skips, compute_dtype):
    """Pre-skip layer inputs and post-ReLU activations in one pass."""
    inputs, acts = [], []
    h = x0
    for i in range(D):
        if i in skips and i > 0:
            h = jnp.concatenate([x0, h], axis=-1)
        inputs.append(h)
        w, b = weights[i]
        h = jnp.maximum(_dot(h, w, compute_dtype) + b, 0.0)
        acts.append(h)
    return inputs, acts


def _bwd_kernel(
    x_ref, *refs, D: int, skips: Tuple[int, ...], in0: int, width: int,
    compute_dtype,
):
    # refs layout: W0, b0, .., W_{D-1}, b_{D-1}, g_ref,
    #              dx_ref, dW0, db0, .., dW_{D-1}, db_{D-1}
    g_ref = refs[2 * D]
    dx_ref = refs[2 * D + 1]
    dparam_refs = refs[2 * D + 2 :]
    step = pl.program_id(0)

    x0 = x_ref[:]
    weights = [(refs[2 * i][:], refs[2 * i + 1][:]) for i in range(D)]
    inputs, acts = _recompute_chain(x0, weights, D, skips, compute_dtype)

    g = g_ref[:].astype(jnp.float32)
    dx0 = jnp.zeros_like(x0, dtype=jnp.float32)
    for i in reversed(range(D)):
        w, _ = weights[i]
        g = g * (acts[i] > 0)  # relu mask
        dW = _dot(inputs[i].T, g, compute_dtype)
        db = g.sum(axis=0)
        dw_ref = dparam_refs[2 * i]
        db_ref = dparam_refs[2 * i + 1]

        @pl.when(step == 0)
        def _init():
            dw_ref[:] = dW
            db_ref[:] = db

        @pl.when(step != 0)
        def _acc():
            dw_ref[:] = dw_ref[:] + dW
            db_ref[:] = db_ref[:] + db

        g_in = _dot(g, w.T, compute_dtype)
        if i in skips and i > 0:
            dx0 = dx0 + g_in[:, :in0]
            g = g_in[:, in0:]
        elif i == 0:
            dx0 = dx0 + g_in
            g = None
        else:
            g = g_in
    dx_ref[:] = dx0.astype(dx_ref.dtype)


# Set True to run kernels in the Pallas interpreter (CPU tests).
INTERPRET = False


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_trunk(
    x: jnp.ndarray,  # (N, in0) PE input, N a multiple of the tile
    params: Tuple,  # ((W0, b0), ..., (W_{D-1}, b_{D-1}))
    skips: Tuple[int, ...] = (4,),
    tile: int = 1024,
    precision: str = "float32",  # 'bfloat16' casts matmul operands
) -> jnp.ndarray:
    return _fused_fwd_impl(x, params, skips, tile, precision)


def _specs(D, in0, width, skips, tile, dtype):
    n_in = [
        pl.BlockSpec((tile, in0), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for li in range(D):
        d_in = _layer_in_dim(li, in0, width, skips)
        n_in.append(pl.BlockSpec((d_in, width), lambda i: (0, 0), memory_space=pltpu.VMEM))
        n_in.append(pl.BlockSpec((width,), lambda i: (0,), memory_space=pltpu.VMEM))
    return n_in


def _compute_dtype(precision):
    return jnp.bfloat16 if precision == "bfloat16" else jnp.float32


def _fused_fwd_impl(x, params, skips, tile, precision="float32"):
    N, in0 = x.shape
    D = len(params)
    width = params[0][0].shape[1]
    assert N % tile == 0, (N, tile)
    flat = []
    for w, b in params:
        flat += [w, b]
    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, D=D, skips=skips, out_dtype=x.dtype,
            compute_dtype=_compute_dtype(precision),
        ),
        out_shape=jax.ShapeDtypeStruct((N, width), x.dtype),
        grid=(N // tile,),
        in_specs=_specs(D, in0, width, skips, tile, x.dtype),
        out_specs=pl.BlockSpec(
            (tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=INTERPRET,
    )(x, *flat)
    return out


def _fused_fwd(x, params, skips, tile, precision):
    return _fused_fwd_impl(x, params, skips, tile, precision), (x, params)


def _fused_bwd(skips, tile, precision, res, g):
    x, params = res
    N, in0 = x.shape
    D = len(params)
    width = params[0][0].shape[1]
    # The bwd kernel holds inputs+acts for the whole chain (~2*D buffers of
    # tile x width) — at tile 1024 that exceeds the 16 MB VMEM budget
    # (measured 18.5 MB); halve until it fits.
    while tile > 128 and (2 * D + 4) * tile * width * 4 + 3 * D * width * width * 4 > 14 * 2**20:
        tile //= 2
    if N % tile != 0:
        tile = 128
    flat = []
    for w, b in params:
        flat += [w, b]

    out_shapes = [jax.ShapeDtypeStruct((N, in0), x.dtype)]
    out_specs = [
        pl.BlockSpec((tile, in0), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ]
    for li in range(D):
        d_in = _layer_in_dim(li, in0, width, skips)
        out_shapes.append(jax.ShapeDtypeStruct((d_in, width), jnp.float32))
        out_specs.append(
            pl.BlockSpec((d_in, width), lambda i: (0, 0), memory_space=pltpu.VMEM)
        )
        out_shapes.append(jax.ShapeDtypeStruct((width,), jnp.float32))
        out_specs.append(
            pl.BlockSpec((width,), lambda i: (0,), memory_space=pltpu.VMEM)
        )

    in_specs = _specs(D, in0, width, skips, tile, x.dtype)
    in_specs.append(
        pl.BlockSpec((tile, width), lambda i: (i, 0), memory_space=pltpu.VMEM)
    )

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, D=D, skips=skips, in0=in0, width=width,
            compute_dtype=_compute_dtype(precision),
        ),
        out_shape=tuple(out_shapes),
        grid=(N // tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        interpret=INTERPRET,
    )(x, *flat, g)
    dx = outs[0]
    dparams = tuple(
        (outs[1 + 2 * i], outs[2 + 2 * i]) for i in range(D)
    )
    return dx, dparams


fused_trunk.defvjp(_fused_fwd, _fused_bwd)


def reference_trunk(x, params, skips=(4,)):
    """XLA reference implementation for testing."""
    x0 = x
    h = x
    for i, (w, b) in enumerate(params):
        if i in skips and i > 0:
            h = jnp.concatenate([x0, h], axis=-1)
        h = jnp.maximum(jnp.dot(h, w) + b, 0.0)
    return h
