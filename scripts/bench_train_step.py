#!/usr/bin/env python
"""Focused TPU bench: ONLY the flagship blended train step (the bench.py
headline), for fast kernel-tuning iteration. Timing closes over a scalar
readout data-dependent on the updated params (axon: block_until_ready
does not wait for remote execution).

Usage: python scripts/bench_train_step.py [--phase 1] [--steps 20]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, default=1)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--batch", type=int, default=2048)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from __graft_entry__ import _build, _flagship
    from upnerf.train import make_train_step

    nerf_cfg, t_cfg, rcfg = _flagship()
    cfg, scene, store, state, opt, pose_opt = _build(
        n_images=16, H=256, W=256, fh=55, fw=55,
        nerf_cfg=nerf_cfg, t_cfg=t_cfg, rcfg=rcfg, batch_size=args.batch,
        max_steps=600000,
    )
    step, _ = make_train_step(cfg, opt, pose_opt)
    readout = jax.jit(
        lambda s: s.params["nerf_fine"]["trunk"][0]["w"][0, 0]
    )

    t0 = time.perf_counter()
    for _ in range(args.warmup):
        state, _ = step(state, scene, store, args.phase)
    float(readout(state))
    print(f"compile+warmup: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    for _ in range(args.steps):
        state, _ = step(state, scene, store, args.phase)
    float(readout(state))
    dt = (time.perf_counter() - t0) / args.steps
    print(
        f"phase {args.phase}: {dt * 1e3:.2f} ms/step  "
        f"{args.batch / dt / 1e3:.1f}k rays/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
