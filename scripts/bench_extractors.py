#!/usr/bin/env python
"""TPU bench: offline feature extractors at the reference shapes.

Times the DINO ViT-S/8 stride-4 448x448 forward (12,322 tokens — the
reference's preprocess/save_dino_feature.py workload) per attention
implementation ("chunked" XLA vs the "flash" Pallas kernel), and the
DPT-Large depth forward. To amortize the axon relay's per-call dispatch
overhead (~1 s for DINO's ~150 param buffers), each measurement runs
ITERS data-dependent forwards inside ONE jitted call (iteration i+1
perturbs the image by 0*mean_i, forcing sequential execution), and the
timing closes over a scalar fetch of the final mean.

Usage: python scripts/bench_extractors.py [--iters 8] [--impl chunked flash]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_dino(impl: str, iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from upnerf.features import vit

    cfg = vit.ViTConfig(attn_impl=impl)
    params = vit.init_vit_params(jax.random.PRNGKey(0), cfg)
    params = jax.tree.map(jnp.asarray, params)
    img = jax.random.normal(jax.random.PRNGKey(1), (448, 448, 3))

    def one(params, img):
        out = vit.forward_features(params, cfg, img, stride=4, key_layer=9)
        return out["keys"].mean()

    @jax.jit
    def run(params, img):
        def body(_, carry):
            return one(params, img + 0.0 * carry)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(params, img))  # compile + warmup
    t0 = time.perf_counter()
    float(run(params, img))
    return (time.perf_counter() - t0) / iters


def bench_dpt(iters: int) -> float:
    import jax
    import jax.numpy as jnp

    from upnerf.features import dpt

    params = dpt.init_dpt_params(jax.random.PRNGKey(0))
    params = jax.tree.map(jnp.asarray, params)
    img = jax.random.normal(jax.random.PRNGKey(1), (384, 384, 3))

    @jax.jit
    def run(params, img):
        def body(_, carry):
            return dpt.dpt_forward(params, img + 0.0 * carry).mean()

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    float(run(params, img))
    t0 = time.perf_counter()
    float(run(params, img))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--impl", nargs="+", default=["chunked", "flash"])
    ap.add_argument("--skip-dpt", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"backend: {jax.default_backend()}", file=sys.stderr)

    out = {"backend": jax.default_backend(), "iters": args.iters}
    for impl in args.impl:
        dt = bench_dino(impl, args.iters)
        out[f"dino_ms_{impl}"] = round(dt * 1e3, 2)
        print(f"dino[{impl}]: {dt * 1e3:.1f} ms/image", file=sys.stderr)
    if not args.skip_dpt:
        dt = bench_dpt(args.iters)
        out["dpt_ms"] = round(dt * 1e3, 2)
        print(f"dpt: {dt * 1e3:.1f} ms/image", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
