#!/usr/bin/env python
"""MXU ceiling probe at the render kernel's matmul shapes.

Measures a Pallas kernel that is NOTHING but a chain of (M, 256) @
(256, 256) bf16 matmuls — (a) pure chain with bf16 accumulate (no
epilogue at all), (b) f32 accumulate + bias+relu+cast epilogue (the
render kernel's per-layer pattern). The achieved TFLOP/s against the
v5e bf16 peak (197) separates "that's just what the MXU does at these
shapes" from "the epilogues/serialization are the gap".
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--m", type=int, default=2048)
    ap.add_argument("--w", type=int, default=256)
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--grid", type=int, default=64)
    ap.add_argument("--steps", type=int, default=30)
    args = ap.parse_args()
    M, W, L = args.m, args.w, args.layers

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(M, W).astype(np.float32) * 0.1)
    ws = jnp.asarray(rng.randn(L, W, W).astype(np.float32) * 0.05)
    b = jnp.asarray(rng.randn(W).astype(np.float32) * 0.01)

    def kern_pure(x_ref, w_ref, o_ref):
        # Mosaic requires 32-bit matmul accumulators, so the minimal
        # per-layer epilogue is one f32->bf16 cast.
        h = x_ref[:].astype(jnp.bfloat16)
        for i in range(L):
            h = jnp.dot(
                h, w_ref[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            ).astype(jnp.bfloat16)
        o_ref[:] = h.astype(jnp.float32)

    def kern_epi(x_ref, w_ref, b_ref, o_ref):
        h = x_ref[:]
        for i in range(L):
            acc = jnp.dot(
                h.astype(jnp.bfloat16), w_ref[i].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
            h = jnp.maximum(acc + b_ref[:], 0.0)
        o_ref[:] = h

    def run(label, kern, ops):
        call = pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((M, W), jnp.float32),
            grid=(args.grid,),
            in_specs=[
                pl.BlockSpec((M, W), lambda i: (0, 0),
                             memory_space=pltpu.VMEM)
            ] + [
                pl.BlockSpec(s.shape, lambda i, nd=s.ndim: (0,) * nd,
                             memory_space=pltpu.VMEM)
                for s in ops
            ],
            out_specs=pl.BlockSpec((M, W), lambda i: (0, 0),
                                   memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 2**20
            ),
        )
        f = jax.jit(lambda *a: call(*a).sum())
        float(f(x, *ops))
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.steps):
            acc = f(x, *ops)
        float(acc)
        dt = (time.perf_counter() - t0) / args.steps
        flops = 2 * M * W * W * L * args.grid
        print(f"{label}: {dt * 1e3:.3f} ms  "
              f"{flops / dt / 1e12:.1f} TFLOP/s "
              f"({flops / dt / 1e12 / 197 * 100:.0f}% of bf16 peak)",
              flush=True)

    def kern_int8(x_ref, w_ref, o_ref):
        # Quantized-serving probe: int8 x int8 -> int32 accumulate, scale
        # + relu in f32, requantize activations to int8 for the next layer
        # (the realistic per-layer epilogue of an int8 inference chain).
        h = jnp.clip(x_ref[:] * 127.0, -127, 127).astype(jnp.int8)
        for i in range(L):
            acc = jnp.dot(
                h, w_ref[i], preferred_element_type=jnp.int32
            )
            f = jnp.maximum(acc.astype(jnp.float32) * (1.0 / (127 * 127)), 0.0)
            h = jnp.clip(f * 127.0, -127, 127).astype(jnp.int8)
        o_ref[:] = h.astype(jnp.float32)

    run("pure bf16 chain   ", kern_pure, (ws,))
    run("f32 acc + epilogue", kern_epi, (ws, b))
    ws_i8 = jnp.asarray(
        np.clip(np.asarray(ws) * 127 / np.abs(ws).max(), -127, 127), jnp.int8
    )
    run("int8 chain + requant", kern_int8, (ws_i8,))


if __name__ == "__main__":
    main()
