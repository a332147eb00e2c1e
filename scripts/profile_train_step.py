#!/usr/bin/env python
"""Per-kernel device-time breakdown of the flagship blended train step.

Captures a jax.profiler trace of a few steady-state steps and prints the
top device ops by total duration (parsed from the chrome-trace JSON the
profiler writes — no tensorboard/xprof needed). Run AFTER the step is in
the persistent compile cache to avoid a multi-minute remote compile.
"""

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", type=int, default=1)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--outdir", default="/tmp/upnerf_profile")
    ap.add_argument("--top", type=int, default=25)
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
        nerf_cfg=nerf_cfg, t_cfg=t_cfg, rcfg=rcfg, batch_size=2048,
        max_steps=600000,
    )
    step, _ = make_train_step(cfg, opt, pose_opt)
    readout = jax.jit(lambda s: s.params["nerf_fine"]["trunk"][0]["w"][0, 0])

    for _ in range(3):
        state, _ = step(state, scene, store, args.phase)
    float(readout(state))

    os.makedirs(args.outdir, exist_ok=True)
    jax.profiler.start_trace(args.outdir)
    for _ in range(args.steps):
        state, _ = step(state, scene, store, args.phase)
    float(readout(state))
    jax.profiler.stop_trace()

    traces = sorted(
        glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                  recursive=True),
        key=os.path.getmtime,
    )
    if not traces:
        print("no trace.json.gz found under", args.outdir)
        return
    with gzip.open(traces[-1], "rt") as f:
        trace = json.load(f)

    # Device-lane events: pick the process whose name mentions TPU/device.
    pid_names = {}
    tid_names = {}
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev["args"].get("name", "")
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            tid_names[(ev["pid"], ev["tid"])] = ev["args"].get("name", "")

    device_pids = {
        pid for pid, name in pid_names.items()
        if "TPU" in name or "tpu" in name or "Device" in name
    }
    durs = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    for ev in trace.get("traceEvents", []):
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        tname = tid_names.get((ev["pid"], ev["tid"]), "")
        if "step" in tname.lower():  # steps lane double-counts
            continue
        name = ev.get("name", "?")
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        durs[name] += dur
        counts[name] += 1
        total += dur

    n = args.steps
    print(f"\ndevice total: {total:.2f} ms over {n} steps "
          f"({total / n:.2f} ms/step)\n")
    print(f"{'ms/step':>9}  {'count':>5}  op")
    for name, d in sorted(durs.items(), key=lambda kv: -kv[1])[: args.top]:
        print(f"{d / n:9.3f}  {counts[name]:5d}  {name[:100]}")


if __name__ == "__main__":
    main()
