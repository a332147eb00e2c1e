"""Pallas TPU kernel: fused trunk + density/feature/candidate heads.

Extends the fused trunk (pallas_mlp) through the sample-conditioned heads:

  h       = trunk(x0)                       # D x dense+ReLU, skip concat
  s_sigma = softplus(h @ Ws + bs)
  xyzf    = h @ Wx + bx
  s_feat  = xyzf @ Wf + bf
  [candidate] cin = concat(xyzf, c_emb)     # c_emb broadcast per-sample
              h1  = relu(cin @ W1 + b1); h2 = relu(h1 @ W2 + b2)
              c_sigma = softplus(h2 @ Wc + bc); c_feat = h2 @ Wf2 + bf2

Profiling showed the XLA head matmuls run at ~22% MXU utilization —
HBM-bound on the (N, 256) trunk output and its backward reads (~31 ms of an
81 ms flagship step). This kernel keeps h/xyzf/h1/h2 in VMEM; only the head
OUTPUTS (already required by compositing) plus per-sample input gradients
leave the chip. The custom VJP recomputes the chain per tile and
accumulates all weight gradients across the sequential grid.

The view-dependent RGB head stays in XLA: its first layer needs per-ray
conditioning whose in-kernel gradient reduction would require ray-aligned
output blocks below Mosaic's (8, x) minimum.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_mlp import _layer_in_dim

# Set True to run in the Pallas interpreter (CPU tests).
INTERPRET = False

HEAD_KEYS = ("sigma_w", "sigma_b", "xyzf_w", "xyzf_b", "feat_w", "feat_b")
CAND_KEYS = (
    "c1_w", "c1_b", "c2_w", "c2_b", "csig_w", "csig_b", "cfeat_w", "cfeat_b",
)


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


def _chain(x0, trunk, D, skips, compute_dtype):
    inputs, acts = [], []
    h = x0
    for i in range(D):
        if i in skips and i > 0:
            h = jnp.concatenate([x0, h], axis=-1)
        inputs.append(h)
        w, b = trunk[i]
        h = jnp.maximum(_dot(h, w, compute_dtype) + b, 0.0)
        acts.append(h)
    return inputs, acts


def _heads_fwd(h, c_emb, head, cand, compute_dtype):
    s_sigma = jax.nn.softplus(_dot(h, head["sigma_w"], compute_dtype) + head["sigma_b"])
    xyzf = _dot(h, head["xyzf_w"], compute_dtype) + head["xyzf_b"]
    s_feat = _dot(xyzf, head["feat_w"], compute_dtype) + head["feat_b"]
    out = dict(s_sigma=s_sigma, xyzf=xyzf, s_feat=s_feat)
    if cand is not None:
        cin = jnp.concatenate([xyzf, c_emb], axis=-1)
        h1 = jnp.maximum(_dot(cin, cand["c1_w"], compute_dtype) + cand["c1_b"], 0.0)
        h2 = jnp.maximum(_dot(h1, cand["c2_w"], compute_dtype) + cand["c2_b"], 0.0)
        c_sigma = jax.nn.softplus(
            _dot(h2, cand["csig_w"], compute_dtype) + cand["csig_b"]
        )
        c_feat = _dot(h2, cand["cfeat_w"], compute_dtype) + cand["cfeat_b"]
        out.update(cin=cin, h1=h1, h2=h2, c_sigma=c_sigma, c_feat=c_feat)
    return out


def _unpack(refs, off, keys):
    return {k: refs[off + i][:] for i, k in enumerate(keys)}


def _fwd_kernel(x_ref, *refs, D, skips, use_cand, compute_dtype):
    # refs: [c_emb?], trunk 2D, head 6, [cand 8], outputs...
    i = 0
    c_emb = None
    if use_cand:
        c_emb = refs[0][:]
        i = 1
    trunk = [(refs[i + 2 * k][:], refs[i + 2 * k + 1][:]) for k in range(D)]
    i += 2 * D
    head = _unpack(refs, i, HEAD_KEYS)
    i += len(HEAD_KEYS)
    cand = None
    if use_cand:
        cand = _unpack(refs, i, CAND_KEYS)
        i += len(CAND_KEYS)
    outs = refs[i:]

    x0 = x_ref[:]
    _, acts = _chain(x0, trunk, D, skips, compute_dtype)
    f = _heads_fwd(acts[-1], c_emb, head, cand, compute_dtype)
    outs[0][:] = f["s_sigma"]
    outs[1][:] = f["s_feat"]
    if use_cand:
        outs[2][:] = f["c_sigma"]
        outs[3][:] = f["c_feat"]


def _bwd_kernel(
    x_ref, *refs, D, skips, use_cand, in0, compute_dtype,
):
    # refs: [c_emb?], trunk 2D, head 6, [cand 8],
    #       cotangents: g_ssigma, g_sfeat, [g_csigma, g_cfeat],
    #       outputs: dx0, [dc_emb], trunk d (2D), head d (6), [cand d (8)]
    i = 0
    c_emb = None
    if use_cand:
        c_emb = refs[0][:]
        i = 1
    trunk = [(refs[i + 2 * k][:], refs[i + 2 * k + 1][:]) for k in range(D)]
    i += 2 * D
    head = _unpack(refs, i, HEAD_KEYS)
    i += len(HEAD_KEYS)
    cand = None
    if use_cand:
        cand = _unpack(refs, i, CAND_KEYS)
        i += len(CAND_KEYS)
    n_cot = 4 if use_cand else 2
    cots = refs[i : i + n_cot]
    i += n_cot
    dx_ref = refs[i]
    i += 1
    dcemb_ref = None
    if use_cand:
        dcemb_ref = refs[i]
        i += 1
    dparam_refs = refs[i:]

    step = pl.program_id(0)
    x0 = x_ref[:]
    inputs, acts = _chain(x0, trunk, D, skips, compute_dtype)
    h = acts[-1]
    f = _heads_fwd(h, c_emb, head, cand, compute_dtype)

    g_ss = cots[0][:].astype(jnp.float32)
    g_sf = cots[1][:].astype(jnp.float32)

    dparams = {}
    # s_feat backward
    dW_f = _dot(f["xyzf"].T, g_sf, compute_dtype)
    db_f = g_sf.sum(0)
    dxyzf = _dot(g_sf, head["feat_w"].T, compute_dtype)

    if use_cand:
        g_cs = cots[2][:].astype(jnp.float32)
        g_cf = cots[3][:].astype(jnp.float32)
        # c_feat
        dW_cf = _dot(f["h2"].T, g_cf, compute_dtype)
        db_cf = g_cf.sum(0)
        dh2 = _dot(g_cf, cand["cfeat_w"].T, compute_dtype)
        # c_sigma (softplus')
        dpre_cs = g_cs * (1.0 - jnp.exp(-f["c_sigma"]))
        dW_cs = _dot(f["h2"].T, dpre_cs, compute_dtype)
        db_cs = dpre_cs.sum(0)
        dh2 = dh2 + _dot(dpre_cs, cand["csig_w"].T, compute_dtype)
        dh2 = dh2 * (f["h2"] > 0)
        dW_c2 = _dot(f["h1"].T, dh2, compute_dtype)
        db_c2 = dh2.sum(0)
        dh1 = _dot(dh2, cand["c2_w"].T, compute_dtype)
        dh1 = dh1 * (f["h1"] > 0)
        dW_c1 = _dot(f["cin"].T, dh1, compute_dtype)
        db_c1 = dh1.sum(0)
        dcin = _dot(dh1, cand["c1_w"].T, compute_dtype)
        W = head["xyzf_w"].shape[1]
        dxyzf = dxyzf + dcin[:, :W]
        dcemb_ref[:] = dcin[:, W:]
        dparams.update(
            c1_w=dW_c1, c1_b=db_c1, c2_w=dW_c2, c2_b=db_c2,
            csig_w=dW_cs, csig_b=db_cs, cfeat_w=dW_cf, cfeat_b=db_cf,
        )

    # xyzf backward
    dW_x = _dot(h.T, dxyzf, compute_dtype)
    db_x = dxyzf.sum(0)
    dh = _dot(dxyzf, head["xyzf_w"].T, compute_dtype)
    # s_sigma backward (softplus')
    dpre_ss = g_ss * (1.0 - jnp.exp(-f["s_sigma"]))
    dW_s = _dot(h.T, dpre_ss, compute_dtype)
    db_s = dpre_ss.sum(0)
    dh = dh + _dot(dpre_ss, head["sigma_w"].T, compute_dtype)
    dparams.update(
        sigma_w=dW_s, sigma_b=db_s, xyzf_w=dW_x, xyzf_b=db_x,
        feat_w=dW_f, feat_b=db_f,
    )

    # trunk backward
    g = dh
    dx0 = jnp.zeros_like(x0, dtype=jnp.float32)
    trunk_grads = []
    for k in reversed(range(D)):
        w, _ = trunk[k]
        g = g * (acts[k] > 0)
        dW = _dot(inputs[k].T, g, compute_dtype)
        db = g.sum(axis=0)
        trunk_grads.append((k, dW, db))
        g_in = jnp.dot(g, w.T, preferred_element_type=jnp.float32)
        if k in skips and k > 0:
            dx0 = dx0 + g_in[:, :in0]
            g = g_in[:, in0:]
        elif k == 0:
            dx0 = dx0 + g_in
        else:
            g = g_in
    dx_ref[:] = dx0

    head_order = list(HEAD_KEYS) + (list(CAND_KEYS) if use_cand else [])
    vals = []
    for k, dW, db in trunk_grads:
        pass  # indexed below

    @pl.when(step == 0)
    def _init():
        for k, dW, db in trunk_grads:
            dparam_refs[2 * k][:] = dW
            dparam_refs[2 * k + 1][:] = db
        for j, name in enumerate(head_order):
            dparam_refs[2 * D + j][:] = dparams[name]

    @pl.when(step != 0)
    def _acc():
        for k, dW, db in trunk_grads:
            dparam_refs[2 * k][:] = dparam_refs[2 * k][:] + dW
            dparam_refs[2 * k + 1][:] = dparam_refs[2 * k + 1][:] + db
        for j, name in enumerate(head_order):
            dparam_refs[2 * D + j][:] = dparam_refs[2 * D + j][:] + dparams[name]


def _vmem_full(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _row_block(tile, dim):
    return pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def fused_trunk_heads(
    x0: jnp.ndarray,  # (N, in0)
    c_emb: Optional[jnp.ndarray],  # (N, C) per-sample candidate emb or None
    trunk: Tuple,  # ((W, b), ...)
    heads: Dict[str, jnp.ndarray],  # HEAD_KEYS [+ CAND_KEYS]
    skips: Tuple[int, ...] = (4,),
    tile: int = 512,
    precision: str = "float32",
):
    """Returns (s_sigma (N,1), s_feat (N,F)[, c_sigma (N,1), c_feat (N,F)])."""
    return _impl(x0, c_emb, trunk, heads, skips, tile, precision)


def _specs_and_flat(x0, c_emb, trunk, heads, tile, use_cand):
    in_specs = [_row_block(tile, x0.shape[1])]
    flat = []
    if use_cand:
        in_specs.append(_row_block(tile, c_emb.shape[1]))
        flat.append(c_emb)
    for w, b in trunk:
        in_specs += [_vmem_full(w.shape), _vmem_full(b.shape)]
        flat += [w, b]
    keys = list(HEAD_KEYS) + (list(CAND_KEYS) if use_cand else [])
    for k in keys:
        in_specs.append(_vmem_full(heads[k].shape))
        flat.append(heads[k])
    return in_specs, flat


def _impl(x0, c_emb, trunk, heads, skips, tile, precision):
    N, in0 = x0.shape
    D = len(trunk)
    use_cand = c_emb is not None
    F = heads["feat_w"].shape[1]
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    assert N % tile == 0, (N, tile)
    in_specs, flat = _specs_and_flat(x0, c_emb, trunk, heads, tile, use_cand)

    out_shape = [
        jax.ShapeDtypeStruct((N, 1), jnp.float32),
        jax.ShapeDtypeStruct((N, F), jnp.float32),
    ]
    out_specs = [_row_block(tile, 1), _row_block(tile, F)]
    if use_cand:
        out_shape += [
            jax.ShapeDtypeStruct((N, 1), jnp.float32),
            jax.ShapeDtypeStruct((N, F), jnp.float32),
        ]
        out_specs += [_row_block(tile, 1), _row_block(tile, F)]

    outs = pl.pallas_call(
        functools.partial(
            _fwd_kernel, D=D, skips=tuple(skips), use_cand=use_cand,
            compute_dtype=compute_dtype,
        ),
        out_shape=tuple(out_shape),
        grid=(N // tile,),
        in_specs=[in_specs[0]] + in_specs[1:],
        out_specs=tuple(out_specs),
        interpret=INTERPRET,
    )(x0, *flat)
    return outs


def _fwd(x0, c_emb, trunk, heads, skips, tile, precision):
    return _impl(x0, c_emb, trunk, heads, skips, tile, precision), (
        x0, c_emb, trunk, heads,
    )


def _bwd(skips, tile, precision, res, g):
    x0, c_emb, trunk, heads = res
    N, in0 = x0.shape
    D = len(trunk)
    use_cand = c_emb is not None
    compute_dtype = jnp.bfloat16 if precision == "bfloat16" else jnp.float32
    # backward holds the full chain + head activations per tile: shrink
    # (keeping the 8-row Mosaic minimum)
    bt = tile
    width = trunk[0][0].shape[1]
    F = heads["feat_w"].shape[1]
    while bt > 8 and (2 * D + 4) * bt * width * 4 + 3 * bt * F * 4 > 9 * 2**20:
        bt //= 2
    assert N % bt == 0

    in_specs, flat = _specs_and_flat(x0, c_emb, trunk, heads, bt, use_cand)
    cot_specs = [_row_block(bt, 1), _row_block(bt, F)]
    cots = [g[0], g[1]]
    if use_cand:
        cot_specs += [_row_block(bt, 1), _row_block(bt, F)]
        cots += [g[2], g[3]]

    out_shape = [jax.ShapeDtypeStruct((N, in0), jnp.float32)]
    out_specs = [_row_block(bt, in0)]
    if use_cand:
        out_shape.append(jax.ShapeDtypeStruct((N, c_emb.shape[1]), jnp.float32))
        out_specs.append(_row_block(bt, c_emb.shape[1]))
    for w, b in trunk:
        out_shape += [
            jax.ShapeDtypeStruct(w.shape, jnp.float32),
            jax.ShapeDtypeStruct(b.shape, jnp.float32),
        ]
        out_specs += [_vmem_full(w.shape), _vmem_full(b.shape)]
    keys = list(HEAD_KEYS) + (list(CAND_KEYS) if use_cand else [])
    for k in keys:
        out_shape.append(jax.ShapeDtypeStruct(heads[k].shape, jnp.float32))
        out_specs.append(_vmem_full(heads[k].shape))

    outs = pl.pallas_call(
        functools.partial(
            _bwd_kernel, D=D, skips=tuple(skips), use_cand=use_cand,
            in0=in0, compute_dtype=compute_dtype,
        ),
        out_shape=tuple(out_shape),
        grid=(N // bt,),
        in_specs=in_specs + cot_specs,
        out_specs=tuple(out_specs),
        interpret=INTERPRET,
    )(x0, *flat, *cots)

    i = 0
    dx0 = outs[i]; i += 1
    dc_emb = None
    if use_cand:
        dc_emb = outs[i]; i += 1
    dtrunk = tuple((outs[i + 2 * k], outs[i + 2 * k + 1]) for k in range(D))
    i += 2 * D
    dheads = {k: outs[i + j] for j, k in enumerate(keys)}
    return dx0, dc_emb, dtrunk, dheads


fused_trunk_heads.defvjp(_fwd, _bwd)


def reference_trunk_heads(x0, c_emb, trunk, heads, skips=(4,)):
    """XLA reference for testing."""
    from .pallas_mlp import reference_trunk

    h = reference_trunk(x0, trunk, skips)
    s_sigma = jax.nn.softplus(h @ heads["sigma_w"] + heads["sigma_b"])
    xyzf = h @ heads["xyzf_w"] + heads["xyzf_b"]
    s_feat = xyzf @ heads["feat_w"] + heads["feat_b"]
    if c_emb is None:
        return s_sigma, s_feat
    cin = jnp.concatenate([xyzf, c_emb], -1)
    h1 = jnp.maximum(cin @ heads["c1_w"] + heads["c1_b"], 0.0)
    h2 = jnp.maximum(h1 @ heads["c2_w"] + heads["c2_b"], 0.0)
    c_sigma = jax.nn.softplus(h2 @ heads["csig_w"] + heads["csig_b"])
    c_feat = h2 @ heads["cfeat_w"] + heads["cfeat_b"]
    return s_sigma, s_feat, c_sigma, c_feat
