"""Fast serving render (interval tightening) — quality + speed A/B.

Quality (needs a trained run): renders train-split views of a trained
synthetic-scene checkpoint through the SAME pose-renderer pipeline with
the full budget vs the fast (probe + reduced budget) config and reports
PSNR vs GT for both — the full-vs-fast DELTA is the number that matters.

Speed (no weights needed): flagship-shape (D8/W256, 128+128 -> 384
samples/ray) full-image render, full vs fast, on the live chip.

    python scripts/bench_fast_render.py --quality outputs_validation/out/synth/r3_ab_seed777
    python scripts/bench_fast_render.py --speed

Timing discipline: every window closed by a scalar fetch data-dependent on
the render (CLAUDE.md: block_until_ready does not wait through the axon
relay)."""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def quality(result_dir: str, fast_div: int = 2, n_views: int = 3,
            min_mass: float = None, eps: float = None, pad: int = None,
            n_probe: int = None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from upnerf.cli.tto import load_trained
    from upnerf.data.images import load_rgb_u8
    from upnerf.evaluate.metrics import psnr
    from upnerf.evaluate.render import make_pose_renderer, render_image
    from upnerf.geometry import se3
    from upnerf.models import NeRFConfig
    from upnerf.render import FastRenderConfig, RenderConfig

    hparams, state, meta = load_trained(result_dir, "last")
    nerf_cfg = NeRFConfig.from_hparams(hparams)
    rcfg = RenderConfig.from_hparams(hparams)._replace(perturb=0.0)
    fast = FastRenderConfig(
        N_samples=max(8, rcfg.N_samples // fast_div),
        N_importance=max(8, rcfg.N_importance // fast_div),
    )
    if n_probe is not None:
        fast = fast._replace(n_probe=n_probe)
    if eps is not None:
        fast = fast._replace(eps=eps)
    if pad is not None:
        fast = fast._replace(pad=pad)
    if min_mass is not None:  # min_mass=1e9 -> fallback-always control
        fast = fast._replace(min_mass=min_mass)
    chunk = hparams["val.chunk_size"]
    r_full = make_pose_renderer(nerf_cfg, rcfg, chunk=chunk)
    r_fast = make_pose_renderer(nerf_cfg, rcfg, chunk=chunk, fast=fast)

    params = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    near_far = np.array(
        [hparams["nerf.near"], hparams["nerf.far"]], np.float32
    )
    rows = []
    for i in range(min(n_views, meta.N_images_train)):
        img_id = meta.img_ids_train[i]
        base = jnp.asarray(np.asarray(meta.poses_dict[img_id], np.float32))
        refine = se3.se3_to_SE3(state.pose_params["se3"][i])
        pose = np.asarray(se3.compose([refine, base]))
        K = meta.Ks[img_id]
        gt = load_rgb_u8(
            os.path.join(meta.image_dir, meta.image_paths[img_id]),
            meta.scale,
        ).astype(np.float32) / 255.0
        h, w = gt.shape[:2]
        out = {}
        for name, r in (("full", r_full), ("fast", r_fast)):
            rgb, _ = render_image(
                r, params, K, pose, (w, h), near_far, i, chunk=chunk
            )
            out[name] = float(psnr(jnp.asarray(rgb), jnp.asarray(gt)))
        rows.append(out)
        print(f"view {i}: full {out['full']:.2f} dB, fast {out['fast']:.2f} dB")

    full = float(np.mean([r["full"] for r in rows]))
    fastp = float(np.mean([r["fast"] for r in rows]))
    print(json.dumps({
        "mode": "quality",
        "result_dir": result_dir,
        "full_budget": [rcfg.N_samples, rcfg.N_importance],
        "fast_budget": [fast.N_samples, fast.N_importance],
        "n_probe": fast.n_probe,
        "eps": fast.eps,
        "pad": fast.pad,
        "min_mass": fast.min_mass,
        "psnr_full": round(full, 3),
        "psnr_fast": round(fastp, 3),
        "psnr_delta": round(fastp - full, 3),
    }))


def speed(H: int = 256, W: int = 256, chunk: int = 4096):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from upnerf.utils import enable_compile_cache

    enable_compile_cache()
    from __graft_entry__ import _build, _flagship
    from upnerf.evaluate.render import make_pose_renderer
    from upnerf.render import FastRenderConfig

    nerf_cfg, t_cfg, rcfg = _flagship()
    rcfg = rcfg._replace(perturb=0.0)
    _, scene, _, state, _, _ = _build(
        n_images=4, H=H, W=W, fh=16, fw=16,
        nerf_cfg=nerf_cfg, t_cfg=t_cfg, rcfg=rcfg, batch_size=2048,
    )
    params = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    fast = FastRenderConfig(N_samples=64, N_importance=64)
    n = H * W
    pad = (-n) % chunk
    jj, ii = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    px = jnp.asarray(np.pad(ii.ravel().astype(np.float32), (0, pad)))
    py = jnp.asarray(np.pad(jj.ravel().astype(np.float32), (0, pad)))
    K = jnp.asarray(np.asarray(scene.Ks[0]))
    pose = jnp.eye(3, 4)
    near_far = jnp.array([0.1, 5.0])

    out = {}
    for name, f in (("full", None), ("fast", fast)):
        r = make_pose_renderer(nerf_cfg, rcfg, chunk=chunk, fast=f)
        rgb, _ = r(params, K, pose, px, py, near_far, 0)
        float(rgb.sum())  # data-dependent close (compile + warm)
        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            rgb, _ = r(params, K, pose, px, py, near_far, 0)
        float(rgb.sum())
        dt = (time.perf_counter() - t0) / reps
        out[name] = (n + pad) / dt
        print(f"{name}: {out[name]:.0f} rays/s ({dt * 1e3:.1f} ms/image)")
    print(json.dumps({
        "mode": "speed",
        "image": [H, W],
        "full_budget": [rcfg.N_samples, rcfg.N_importance],
        "fast_budget": [fast.N_samples, fast.N_importance],
        "n_probe": fast.n_probe,
        "rays_per_sec_full": round(out["full"], 1),
        "rays_per_sec_fast": round(out["fast"], 1),
        "speedup": round(out["fast"] / out["full"], 3),
    }))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality", default=None, help="trained run dir")
    ap.add_argument("--speed", action="store_true")
    ap.add_argument("--fast_div", default=2, type=int)
    ap.add_argument("--min_mass", default=None, type=float)
    ap.add_argument("--eps", default=None, type=float)
    ap.add_argument("--pad", default=None, type=int)
    ap.add_argument("--n_probe", default=None, type=int)
    args = ap.parse_args()
    if args.quality:
        quality(args.quality, fast_div=args.fast_div, min_mass=args.min_mass,
                eps=args.eps, pad=args.pad, n_probe=args.n_probe)
    if args.speed:
        speed()
