"""Host-streaming scale proof: the memmap prefetcher path at downscale-1
Phototourism scale.

The reference keeps ~40 GB of float32 per-ray buffers in host RAM at
downscale 1 (datasets/phototourism.py:36-37) and feeds the GPU through
torch DataLoader workers. Our streaming path (tpu.store_on_device=False)
gathers batches from the compact u16/u8/f16 memmap store
(upnerf/data/prefetch.py) on a background thread. This script measures it
at emulated downscale-1 row count (default 5.2e8 rays ≈ 763 brandenburg
train images at ~1000x700 — a ~6.8 GB compact store, vs the reference's
~40 GB f32 pickles):

  --mode host : prefetcher-only gather + (optional) no-op device_put —
                the pure host-side ceiling, runs on CPU.
  --mode tpu  : the REAL production path — prepare a cache, swap in the
                huge store, run Trainer.fit(store_on_device=False) on the
                live chip and report steady-state rays/s + prefetcher
                occupancy (queue depth when the device asks).

Store rows are synthetic (random px/py/img values within range); training
numerics are irrelevant to the I/O measurement.
"""

import argparse
import json
import os
import shutil
import sys
import time

import numpy as np

# runnable as `python scripts/bench_host_streaming.py` without installing
# the package; do NOT use PYTHONPATH=/root/repo — it shadows modules the
# axon TPU plugin imports and breaks backend registration
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STORE_DIR = "/tmp/upnerf_stream_store"


def build_store(n_rays: int, n_images: int, W: int, H: int) -> dict:
    """Create (or reuse) the giant memmap store."""
    os.makedirs(STORE_DIR, exist_ok=True)
    spec = {
        "px": (np.uint16, (), W),
        "py": (np.uint16, (), H),
        "img_idx": (np.uint16, (), n_images),
        "rgb": (np.uint8, (3,), 256),
        "inv_depth": (np.float16, (), 1),
    }
    meta_p = os.path.join(STORE_DIR, "meta.json")
    if os.path.isfile(meta_p) and json.load(open(meta_p)).get("n") == n_rays:
        return {
            k: np.load(os.path.join(STORE_DIR, f"{k}.npy"), mmap_mode="r")
            for k in spec
        }
    rng = np.random.RandomState(0)
    chunk = 16 * 2**20
    for k, (dt, extra, hi) in spec.items():
        shape = (n_rays, *extra)
        arr = np.lib.format.open_memmap(
            os.path.join(STORE_DIR, f"{k}.npy"), mode="w+", dtype=dt,
            shape=shape,
        )
        for i0 in range(0, n_rays, chunk):
            i1 = min(i0 + chunk, n_rays)
            if dt == np.float16:
                arr[i0:i1] = rng.rand(i1 - i0).astype(np.float16)
            else:
                arr[i0:i1] = rng.randint(
                    0, hi, (i1 - i0, *extra)
                ).astype(dt)
        arr.flush()
        del arr
        print(f"[store] wrote {k} {shape}", flush=True)
    json.dump({"n": n_rays}, open(meta_p, "w"))
    return {
        k: np.load(os.path.join(STORE_DIR, f"{k}.npy"), mmap_mode="r")
        for k in spec
    }


class InstrumentedPrefetcher:
    """Wraps BatchPrefetcher.__next__ to record device-side starvation."""

    def __init__(self, inner):
        self.inner = inner
        self.waits = []

    def __iter__(self):
        return self

    def __next__(self):
        t0 = time.perf_counter()
        b = next(self.inner)
        self.waits.append(time.perf_counter() - t0)
        return b

    def close(self):
        self.inner.close()


def run_host(store, batch_size: int, steps: int) -> None:
    from upnerf.data.prefetch import BatchPrefetcher

    pf = BatchPrefetcher(store, batch_size, device_put=lambda b: b, seed=1)
    for _ in range(10):  # warm
        next(pf)
    t0 = time.perf_counter()
    for _ in range(steps):
        next(pf)
    dt = time.perf_counter() - t0
    pf.close()
    print(json.dumps({
        "mode": "host_gather",
        "n_rays_store": int(store["px"].shape[0]),
        "batch_size": batch_size,
        "rays_per_sec": round(batch_size * steps / dt, 1),
        "ms_per_batch": round(dt / steps * 1e3, 3),
    }))


def run_tpu(store, batch_size: int, steps: int) -> None:
    """The production path: synthetic scene + cache, huge store swapped in,
    Trainer.fit on the streaming branch."""
    import jax

    from upnerf.data import synthetic
    from upnerf.train.loop import Trainer

    scene_dir = os.path.join(STORE_DIR, "scene")
    if not os.path.isdir(scene_dir):
        synthetic.generate_scene(
            scene_dir, n_train=16, n_test=2, H=64, W=80, feat_hw=32,
            feat_dim=384, focal=80.0, arc=0.2,
        )
    out_dir = os.path.join(STORE_DIR, "out")
    shutil.rmtree(out_dir, ignore_errors=True)

    from upnerf.config import default, merge_from_file
    hp = default()
    merge_from_file(hp, "configs/validation/synth_small.yaml")
    hp.update({
        "root_dir": scene_dir,
        "feat_dir": os.path.join(scene_dir, "DINO"),
        "depth_dir": os.path.join(scene_dir, "DPT"),
        "out_dir": out_dir,
        "max_steps": steps,
        "debug": True,
        "nerf.N_samples": 128,
        "nerf.N_importance": 128,
        "nerf.feat_dim": 384,
        "t_net.feat_dim": 384,
        "train.batch_size": batch_size,
        "train.ckpt_interval": 10**9,
        "train.log_pose_interval": 10**9,
        "val.log_interval": 10**9,
        "tpu.store_on_device": False,
    })

    trainer = Trainer(hp)
    # swap the real (tiny) store for the downscale-1-scale one
    trainer.prefetcher.close()
    from upnerf.data.prefetch import BatchPrefetcher

    inner = BatchPrefetcher(
        store, batch_size,
        device_put=lambda b: jax.tree.map(
            lambda x: jax.device_put(x, trainer.bsh), b
        ),
        seed=1,
    )
    pf = InstrumentedPrefetcher(inner)
    trainer.prefetcher = pf
    trainer.n_rays = int(store["px"].shape[0])

    t0 = time.time()
    trainer.fit(log_every=50, resume=False)
    dt = time.time() - t0

    waits = np.array(pf.waits[10:])
    pf.close()
    # steady-state windows from the trainer's own log (the first window
    # absorbs the jit compiles; later 50-step windows are steady-state)
    mfile = os.path.join(
        out_dir, hp["scene_name"], hp["exp_name"], "metrics.jsonl"
    )
    windows = [
        json.loads(l)["rays_per_sec"]
        for l in open(mfile)
        if "rays_per_sec" in l
    ]
    # The first window absorbs the compiles; with --steps <= log_every the
    # [1:] slice would be empty (nan median) — require enough steps instead.
    if len(windows) < 2:
        raise SystemExit(
            f"only {len(windows)} throughput window(s) logged; run with "
            f"--steps > 2x the 50-step log window for a steady-state number"
        )
    if waits.size == 0:
        waits = np.array(pf.waits) if pf.waits else np.zeros(1)
    # occupancy: fraction of device requests served without blocking >1ms
    print(json.dumps({
        "mode": "tpu_streaming_train",
        "n_rays_store": int(store["px"].shape[0]),
        "batch_size": batch_size,
        "steps": steps,
        "rays_per_sec_steady": round(float(np.median(windows[1:])), 1),
        "rays_per_sec_incl_compile": round(batch_size * steps / dt, 1),
        "prefetch_wait_ms_p50": round(float(np.median(waits)) * 1e3, 3),
        "prefetch_wait_ms_p95": round(float(np.percentile(waits, 95)) * 1e3, 3),
        "occupancy_nonblocking": round(float((waits < 1e-3).mean()), 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["host", "tpu"], default="host")
    ap.add_argument("--n_rays", type=int, default=520_000_000)
    ap.add_argument("--batch_size", type=int, default=2048)
    ap.add_argument("--steps", type=int, default=300)
    args = ap.parse_args()

    if args.mode == "host":
        import jax

        jax.config.update("jax_platforms", "cpu")

    # value ranges match the 16-image synthetic scene used by --mode tpu
    # (gather throughput depends on ROW COUNT, not values)
    store = build_store(args.n_rays, n_images=16, W=80, H=64)
    if args.mode == "host":
        run_host(store, args.batch_size, args.steps)
    else:
        run_tpu(store, args.batch_size, args.steps)
