#!/usr/bin/env python
"""TTO throughput A/B — param_grads True vs False, back-to-back in ONE
session (VERDICT r3 weak #2: DESIGN.md's 72.1->80.9k claim and
BENCH_r03's 61.6k disagreed beyond relay variance; this captures both
arms under identical relay conditions and writes the canonical artifact).

Runs the exact bench.py phase-A TTO step (G=1 frozen-model group, se3 +
fine_a trainables) for each arm, interleaved A/B/A/B over `--rounds`
rounds so slow relay drift cancels, and reports per-arm medians.

Usage: python scripts/bench_tto_ab.py [--rounds 3] [--reps 15]
Writes benchmarks/tto_throughput_ab.json and prints one JSON line.
"""

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_step(param_grads: bool, B: int):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _build, _flagship
    from upnerf.evaluate.tto import TTOConfig, TTOGroup, make_tto_step

    nerf_cfg, t_cfg, rcfg = _flagship()
    _, _, _, state, _, _ = _build(
        n_images=16, H=256, W=256, fh=55, fw=55,
        nerf_cfg=nerf_cfg, t_cfg=t_cfg, rcfg=rcfg, batch_size=2048,
        max_steps=600000,
    )
    cfg = TTOConfig(
        nerf=nerf_cfg,
        render=rcfg._replace(param_grads=param_grads),
        batch_size=B,
    )
    G, H, W = 1, 256, 256
    Ks = np.zeros((G, 3, 3), np.float32)
    Ks[:, 0, 0] = Ks[:, 1, 1] = W * 1.2
    Ks[:, 0, 2] = W / 2
    Ks[:, 1, 2] = H / 2
    Ks[:, 2, 2] = 1
    group = TTOGroup(
        Ks=jnp.asarray(Ks),
        base_poses=jnp.broadcast_to(jnp.eye(3, 4), (G, 3, 4)),
        rgbs=jnp.zeros((G, H, W, 3), jnp.uint8),
        wh=jnp.tile(jnp.array([[W, H]], jnp.int32), (G, 1)),
        near_far=jnp.tile(jnp.array([[0.1, 5.0]]), (G, 1)),
    )
    frozen = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    opt = optax.multi_transform(
        {"emb": optax.adam(5e-3), "se3": optax.adam(1e-4)},
        {"fine_a": "emb", "se3": "se3"},
    )
    step = make_tto_step(frozen, cfg, opt, optimize_pose=True,
                         x_frac=(0.0, 1.0))
    trainables = {
        "fine_a": jnp.zeros((G, nerf_cfg.appearance_dim)),
        "se3": jnp.zeros((G, 6)),
    }
    return step, trainables, opt.init(trainables), group, jax


def time_arm(arm, reps, seed):
    step, trainables, opt_state, group, jax = arm
    key = jax.random.PRNGKey(seed)
    for i in range(2):
        trainables, opt_state, loss = step(
            trainables, opt_state, group, jax.random.fold_in(key, i)
        )
    float(loss)  # close warmup (axon: scalar fetch, not block_until_ready)
    t0 = time.perf_counter()
    for i in range(reps):
        trainables, opt_state, loss = step(
            trainables, opt_state, group, jax.random.fold_in(key, 100 + i)
        )
    float(loss)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--reps", type=int, default=15)
    ap.add_argument("--batch", type=int, default=1024)
    args = ap.parse_args()

    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get("UPNERF_COMPILE_CACHE", "/tmp/upnerf_jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import numpy as np

    arms = {
        "param_grads_true": build_step(True, args.batch),
        "param_grads_false": build_step(False, args.batch),
    }
    samples = {k: [] for k in arms}
    for r in range(args.rounds):
        for name, arm in arms.items():
            dt = time_arm(arm, args.reps, seed=r)
            rate = args.batch / dt
            samples[name].append(rate)
            print(f"[round {r}] {name}: {rate / 1e3:.1f}k rays/s",
                  file=sys.stderr)

    med = {k: float(np.median(v)) for k, v in samples.items()}
    out = {
        "metric": "tto_phase_a_rays_per_sec",
        "batch": args.batch,
        "rounds": args.rounds,
        "reps_per_round": args.reps,
        "git_commit": subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True).stdout.strip(),
        "param_grads_true": {
            "median": round(med["param_grads_true"], 1),
            "samples": [round(s, 1) for s in samples["param_grads_true"]],
        },
        "param_grads_false": {
            "median": round(med["param_grads_false"], 1),
            "samples": [round(s, 1) for s in samples["param_grads_false"]],
        },
        "speedup": round(
            med["param_grads_false"] / med["param_grads_true"], 3
        ),
        "note": (
            "interleaved A/B within one session; BENCH_r*.json carries the "
            "canonical absolute number (relay conditions move absolutes "
            "~15% between sessions, the RATIO here is the stable claim)"
        ),
    }
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks", "tto_throughput_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
