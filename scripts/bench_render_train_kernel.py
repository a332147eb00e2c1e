#!/usr/bin/env python
"""TPU microbench: fused training render kernel vs the XLA twin at the
flagship blended-phase workload (value+grad). Timing closes over a scalar
fetch data-dependent on the computation (axon: block_until_ready lies)."""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=2048)
    ap.add_argument("--samples", type=int, default=384)
    ap.add_argument("--precision", default="bfloat16")
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--fwd_only", action="store_true")
    ap.add_argument("--ray_tile", type=int, default=8)
    args = ap.parse_args()

    import os

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from upnerf.ops import pallas_render_train as rt

    D, W, F, HH, HC, C = 8, 256, 384, 128, 128, 16
    IN0, SKIPS = 63, (4,)
    R, S = args.rays, args.samples
    st = rt.RTStatic(
        D=D, skips=SKIPS, use_cand=True, use_rgb=True, out_feat=True,
        precision=args.precision, ray_tile=args.ray_tile,
    )
    rng = np.random.RandomState(0)

    def arr(*shape, scale=0.3):
        return jnp.asarray(rng.randn(*shape).astype(np.float32) * scale)

    x0 = arr(R * S, IN0)
    z = jnp.sort(jnp.asarray(rng.rand(R, S).astype(np.float32) * 4 + 0.1), -1)
    cond = arr(R, HH)
    cemb = arr(R, C)
    trunk = tuple(
        (arr(IN0 if i == 0 else (W + IN0 if i in SKIPS else W), W),
         arr(W, scale=0.05))
        for i in range(D)
    )
    heads = dict(
        xyzf_w=arr(W, W), xyzf_b=arr(W, scale=0.05),
        sigma_w=arr(W, 1), sigma_b=arr(1, scale=0.05),
        feat_w=arr(W, F), feat_b=arr(F, scale=0.05),
        rgb1_w=arr(F, HH), rgb2_w=arr(HH, 3), rgb2_b=arr(3, scale=0.05),
        c1x_w=arr(W, HC), c1c_w=arr(C, HC), c1_b=arr(HC, scale=0.05),
        c2_w=arr(HC, HC), c2_b=arr(HC, scale=0.05),
        csig_w=arr(HC, 1), csig_b=arr(1, scale=0.05),
        cfeat_w=arr(HC, F), cfeat_b=arr(F, scale=0.05),
    )

    def run(fn, label):
        if args.fwd_only:
            def loss(x0_, cond_, cemb_, trunk_, heads_):
                out = fn(x0_, z, cond_, cemb_, trunk_, heads_, st)
                return (
                    out["feat_map"].sum() + out["rgb_map"].sum()
                    + out["s_depth"].sum()
                )
            step = jax.jit(loss)
            def once():
                return step(x0, cond, cemb, trunk, heads)
        else:
            def loss(x0_, cond_, cemb_, trunk_, heads_):
                out = fn(x0_, z, cond_, cemb_, trunk_, heads_, st)
                return (
                    (out["feat_map"] ** 2).sum()
                    + (out["rgb_map"] ** 2).sum()
                    + out["s_depth"].sum()
                )
            grad = jax.jit(jax.value_and_grad(loss, argnums=(0, 3, 4)))
            def once():
                v, g = grad(x0, cond, cemb, trunk, heads)
                return v + g[1][0][0].sum()
        t0 = time.perf_counter()
        float(once())
        print(f"{label}: compile+1 = {time.perf_counter() - t0:.2f}s",
              flush=True)
        t0 = time.perf_counter()
        acc = 0.0
        for _ in range(args.steps):
            acc = once()
        float(acc)
        dt = (time.perf_counter() - t0) / args.steps
        print(f"{label}: {dt * 1e3:.2f} ms/iter "
              f"({R / dt / 1e3:.1f}k rays/s)", flush=True)
        return dt

    dt_fused = run(rt.fused_render_train, "fused")
    dt_xla = run(rt.xla_render_train, "xla  ")
    print(f"speedup: {dt_xla / dt_fused:.2f}x")


if __name__ == "__main__":
    main()
