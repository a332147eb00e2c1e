"""Pallas TPU kernel: forward-only flash attention for the extractors.

The DINO ViT-S/8 extractor runs at stride 4 on 448x448 images
(preprocess/save_dino_feature.py:17-41 in the reference), i.e. 12,322
tokens per block. Dense attention materializes an (H, N, N) score tensor
(~3.6 GB in f32) per block; the query-chunked XLA fallback in
upnerf/features/vit.py bounds VMEM but still streams every chunk's
(H, C, N) scores through HBM twice (softmax write + read). This kernel is
the classic online-softmax formulation: for each query tile it walks the
key/value tiles sequentially, keeping the running row-max ``m``, row-sum
``l`` and the value accumulator in VMEM scratch, so no score tile ever
reaches HBM.

Forward-only by design — the extractors are offline inference
(no VJP is registered; do not differentiate through this).

Layout: ``q, k, v`` are ``(G, N, hd)`` with ``G = batch * heads`` folded;
output is f32 ``(G, N, hd)``. N is padded internally to the block size;
padded KEY rows are masked before the running max (padded QUERY rows
compute garbage that is sliced off at the end). ``hd`` (64 for ViT-S) is
below the 128-lane tile, so the MXU runs half-filled on the contracting
dim — irrelevant here because dense/chunked attention at these shapes is
bandwidth-bound, not FLOPs-bound.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run in the Pallas interpreter (CPU tests).
INTERPRET = False

_NEG_INF = -1e30  # finite: exp(-1e30 - m) == 0 without inf-inf NaN hazards


def _flash_kernel(
    q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
    *, scale, nk, kv_len, block_k, compute_dtype,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _init():
        m_scr[...] = jnp.full(m_scr.shape, _NEG_INF, jnp.float32)
        l_scr[...] = jnp.zeros(l_scr.shape, jnp.float32)
        acc_scr[...] = jnp.zeros(acc_scr.shape, jnp.float32)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0]
    if compute_dtype == jnp.bfloat16:
        q = q.astype(jnp.bfloat16)
        k = k.astype(jnp.bfloat16)
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    # Mask padded key rows (keys beyond kv_len are jnp.pad zeros).
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, _NEG_INF)

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)  # (bq, bk) f32
    l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)

    v = v_ref[0]
    if compute_dtype == jnp.bfloat16:
        pv = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    else:
        pv = jax.lax.dot_general(
            p, v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == nk - 1)
    def _finish():
        o_ref[0] = (acc_scr[...] / l_scr[:, :1]).astype(o_ref.dtype)


def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    *,
    scale: float,
    block_q: int = 512,
    block_k: int = 1024,
    compute_dtype=jnp.bfloat16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """``softmax(q @ k.T * scale) @ v`` per leading index, without ever
    materializing the (N, N) scores.

    q, k, v: (G, N, hd) with G = batch*heads folded. Returns f32
    (G, N, hd). Numerically matches dense f32 attention to ~1e-6 in f32
    mode; bf16 mode matches to bf16 matmul tolerance (the score max/sum
    bookkeeping is always f32).
    """
    if interpret is None:
        interpret = INTERPRET
    G, N, hd = q.shape
    assert k.shape == (G, N, hd) and v.shape == (G, N, hd), (q.shape, k.shape)
    block_q = min(block_q, _round_up(N, 8))
    block_k = min(block_k, _round_up(N, 8))
    nq = _cdiv(N, block_q)
    nk = _cdiv(N, block_k)
    pad_q = nq * block_q - N
    pad_k = nk * block_k - N
    qp = jnp.pad(q, ((0, 0), (0, pad_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pad_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pad_k), (0, 0)))

    kernel = functools.partial(
        _flash_kernel,
        scale=scale, nk=nk, kv_len=N, block_k=block_k,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(G, nq, nk),
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda g, i, j: (g, i, 0)),
            pl.BlockSpec((1, block_k, hd), lambda g, i, j: (g, j, 0)),
            pl.BlockSpec((1, block_k, hd), lambda g, i, j: (g, j, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd), lambda g, i, j: (g, i, 0)),
        out_shape=jax.ShapeDtypeStruct((G, nq * block_q, hd), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),  # running row-max
            pltpu.VMEM((block_q, 128), jnp.float32),  # running row-sum
            pltpu.VMEM((block_q, hd), jnp.float32),   # value accumulator
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :N]


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _round_up(a: int, b: int) -> int:
    return _cdiv(a, b) * b
