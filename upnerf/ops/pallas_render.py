"""Pallas TPU mega-kernel: fused static NeRF render (trunk -> heads ->
alpha compositing) over whole-ray tiles.

Motivation (docs/DESIGN.md perf log): after fusing the trunk, the remaining
step time is dominated by HBM traffic of per-SAMPLE tensors — the (N, 256)
trunk output, (N, 384) features and (N, 3) colors round-trip HBM several
times between the head matmuls and the compositing reductions. This kernel
keeps everything per-sample in VMEM and writes only per-RAY outputs
(rgb (R, 3), depth (R,)) plus the (R, S) sample weights needed by the
importance sampler — several hundred times less output traffic.

Covers the static (phase-2 / sched_mult == 1) render used by the second
half of training, validation, TTO (models/nerf_system_optmize.py renders
with candidate off) and novel-view rendering:

  h     = trunk(pe_x)                      # D x dense+ReLU, skip concat
  sigma = softplus(h @ Ws + bs)
  feat  = (h @ Wxf + bxf) @ Wf + bf        # xyz_final -> feat head
  rgbh  = relu(feat @ Wr1 + ray_cond)      # ray_cond: per-ray dir/app term
  rgb   = sigmoid(rgbh @ Wr2 + br2)
  alpha = 1 - exp(-delta * sigma)          # delta_last = 1e2
  T     = exp(excl_cumsum(log(1 - alpha))) # cumsum as triangular MXU matmul
  w     = alpha * T
  out   : rgb_map = sum_s w*rgb, depth = sum_s w*z, weights = w

The custom VJP recomputes the chain per tile and walks it in reverse; the
transmittance backward is a reversed exclusive cumsum (another triangular
matmul). Tiles are whole rays: (R_t rays) x (S samples).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Set True to run in the Pallas interpreter (CPU tests).
INTERPRET = False

LAST_DELTA = 1e2  # models/rendering.py:126-128
_EPS = 1e-24


def _dot(a, b, compute_dtype):
    if compute_dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    # f32 mode must request f32 MXU passes — Mosaic dot precision defaults
    # to one bf16 pass even for f32 operands (see pallas_mlp._dot).
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _trunk_chain(x0, weights, D, skips, compute_dtype):
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


def _excl_cumsum_tril(x, tril):
    """Exclusive cumsum along the last axis via a strictly-lower-triangular
    matmul (runs on the MXU; S x S with S <= 256). Always f32: log-space
    transmittance sums lose visible mantissa at bf16."""
    return jnp.dot(
        x, tril, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _forward_tile(x0, z, ray_cond, weights, head, D, skips, S, compute_dtype):
    """Returns (sigma, feat, rgb, alpha, T, w, rgb_map, depth) for one tile.
    x0: (R_t*S, in0); z: (R_t, S); ray_cond: (R_t, 128)."""
    Rt = z.shape[0]
    _, acts = _trunk_chain(x0, weights, D, skips, compute_dtype)
    h = acts[-1]
    sigma = jax.nn.softplus(_dot(h, head["sigma_w"], compute_dtype) + head["sigma_b"])
    xyzf = _dot(h, head["xyzf_w"], compute_dtype) + head["xyzf_b"]
    feat = _dot(xyzf, head["feat_w"], compute_dtype) + head["feat_b"]
    rgb_pre = _dot(feat, head["rgb1_w"], compute_dtype)
    rgb_pre = rgb_pre.reshape(Rt, S, -1) + ray_cond[:, None, :]
    rgbh = jnp.maximum(rgb_pre, 0.0).reshape(Rt * S, -1)
    rgb = jax.nn.sigmoid(_dot(rgbh, head["rgb2_w"], compute_dtype) + head["rgb2_b"])

    sigma_r = sigma.reshape(Rt, S)
    deltas = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((Rt, 1), LAST_DELTA, jnp.float32)], -1
    )
    alpha = 1.0 - jnp.exp(-deltas * sigma_r)
    log_om = jnp.log(jnp.maximum(1.0 - alpha, _EPS))
    tril = (
        jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
        > jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    ).astype(jnp.float32).T  # strictly lower in the contraction sense
    T = jnp.exp(_excl_cumsum_tril(log_om, tril))
    w = alpha * T

    rgb_r = rgb.reshape(Rt, S, 3)
    rgb_map = (w[..., None] * rgb_r).sum(axis=1)
    depth = (w * z).sum(axis=1, keepdims=True)  # (Rt, 1)
    return sigma, feat, rgb, rgbh, xyzf, acts, alpha, T, w, rgb_map, depth, deltas


def _fwd_kernel(
    x_ref, z_ref, cond_ref, *refs,
    D, skips, S, n_head, compute_dtype,
):
    # refs: trunk W/b pairs (2D), head tensors (n_head), then outputs:
    # rgb_map, depth, weights
    weights = [(refs[2 * i][:], refs[2 * i + 1][:]) for i in range(D)]
    hoff = 2 * D
    head = _unpack_head(refs, hoff)
    out_rgb = refs[hoff + n_head]
    out_depth = refs[hoff + n_head + 1]
    out_w = refs[hoff + n_head + 2]

    x0 = x_ref[:]
    z = z_ref[:]
    cond = cond_ref[:]
    (*_, w, rgb_map, depth, _d) = _forward_tile(
        x0, z, cond, weights, head, D, skips, S, compute_dtype
    )
    out_rgb[:] = rgb_map
    out_depth[:] = depth
    out_w[:] = w


_HEAD_KEYS = (
    "sigma_w", "sigma_b", "xyzf_w", "xyzf_b", "feat_w", "feat_b",
    "rgb1_w", "rgb2_w", "rgb2_b",
)


def _unpack_head(refs, off):
    return {k: refs[off + i][:] for i, k in enumerate(_HEAD_KEYS)}


def _head_list(head: Dict):
    return [head[k] for k in _HEAD_KEYS]


def _vmem(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8))
def fused_static_render(
    x0: jnp.ndarray,  # (R*S, in0) PE input
    z_vals: jnp.ndarray,  # (R, S)
    ray_cond: jnp.ndarray,  # (R, C_rgbh) per-ray dir/app term incl. bias
    trunk: Tuple,  # ((W, b), ...)
    head: Dict[str, jnp.ndarray],
    skips: Tuple[int, ...] = (4,),
    ray_tile: int = 8,
    precision: str = "float32",
    interpret_unused: int = 0,
):
    """Returns (rgb_map (R, 3), depth (R,), weights (R, S))."""
    return _render_impl(x0, z_vals, ray_cond, trunk, head, skips, ray_tile, precision)


def _common_specs(R, S, in0, trunk, head, ray_tile, D):
    width = trunk[0][0].shape[1]
    in_specs = [
        pl.BlockSpec((ray_tile * S, in0), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((ray_tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (ray_tile, head["rgb1_w"].shape[1]),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        ),
    ]
    flat = []
    for w, b in trunk:
        in_specs.append(_vmem(w.shape))
        in_specs.append(_vmem(b.shape))
        flat += [w, b]
    for k in _HEAD_KEYS:
        in_specs.append(_vmem(head[k].shape))
        flat.append(head[k])
    return in_specs, flat, width


def _render_impl(x0, z_vals, ray_cond, trunk, head, skips, ray_tile, precision):
    R, S = z_vals.shape
    in0 = x0.shape[1]
    D = len(trunk)
    assert R % ray_tile == 0, (R, ray_tile)
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    in_specs, flat, width = _common_specs(R, S, in0, trunk, head, ray_tile, D)

    out = pl.pallas_call(
        functools.partial(
            _fwd_kernel, D=D, skips=tuple(skips), S=S,
            n_head=len(_HEAD_KEYS), compute_dtype=compute_dtype,
        ),
        out_shape=(
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 1), jnp.float32),
            jax.ShapeDtypeStruct((R, S), jnp.float32),
        ),
        grid=(R // ray_tile,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((ray_tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ray_tile, S), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=INTERPRET,
    )(x0, z_vals, ray_cond, *flat)
    return out


def _render_fwd(x0, z_vals, ray_cond, trunk, head, skips, ray_tile, precision, iu):
    out = _render_impl(x0, z_vals, ray_cond, trunk, head, skips, ray_tile, precision)
    return out, (x0, z_vals, ray_cond, trunk, head)


def _render_bwd(skips, ray_tile, precision, iu, res, g):
    """Backward via XLA recompute: the fully-fused backward kernel would
    need whole-ray tiles below Mosaic's (8, x) block minimum to fit the
    activation chain in VMEM at W=256, so the VJP replays the (cheaper to
    compile, equally correct) XLA graph instead — the fused kernel still
    accelerates the forward, which dominates rendering-only paths."""
    x0, z_vals, ray_cond, trunk, head = res

    def f(x0_, cond_, trunk_, head_):
        return xla_static_render(
            x0_, z_vals, cond_, trunk_, head_, skips, precision
        )

    _, vjp = jax.vjp(f, x0, ray_cond, trunk, head)
    dx0, dcond, dtrunk, dhead = vjp(g)
    return dx0, None, dcond, dtrunk, dhead


fused_static_render.defvjp(_render_fwd, _render_bwd)


def xla_static_render(
    x0, z_vals, ray_cond, trunk, head, skips=(4,), precision="float32"
):
    """XLA twin of the kernel (same math, plain cumprod). Used as the
    backward recompute path and as the test reference."""
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    R, S = z_vals.shape
    D = len(trunk)
    hcur = x0
    x_in = x0
    for i, (wte, b) in enumerate(trunk):
        if i in skips and i > 0:
            hcur = jnp.concatenate([x_in, hcur], -1)
        hcur = jnp.maximum(_dot(hcur, wte, compute_dtype) + b, 0.0)
    h = hcur
    sigma = jax.nn.softplus(
        _dot(h, head["sigma_w"], compute_dtype) + head["sigma_b"]
    ).reshape(R, S)
    xyzf = _dot(h, head["xyzf_w"], compute_dtype) + head["xyzf_b"]
    feat = _dot(xyzf, head["feat_w"], compute_dtype) + head["feat_b"]
    rgbh = jnp.maximum(
        _dot(feat, head["rgb1_w"], compute_dtype).reshape(R, S, -1)
        + ray_cond[:, None, :],
        0.0,
    )
    rgb = jax.nn.sigmoid(
        _dot(rgbh.reshape(R * S, -1), head["rgb2_w"], compute_dtype)
        + head["rgb2_b"]
    ).reshape(R, S, 3)

    deltas = jnp.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], jnp.full((R, 1), LAST_DELTA)], -1
    )
    alpha = 1.0 - jnp.exp(-deltas * sigma)
    shifted = jnp.concatenate([jnp.ones((R, 1)), 1.0 - alpha[:, :-1]], -1)
    T = jnp.cumprod(shifted, -1)
    w = alpha * T
    rgb_map = (w[..., None] * rgb).sum(1)
    depth = (w * z_vals).sum(1, keepdims=True)
    return rgb_map, depth, w


def reference_static_render(x0, z_vals, ray_cond, trunk, head, skips=(4,)):
    return xla_static_render(x0, z_vals, ray_cond, trunk, head, skips)
