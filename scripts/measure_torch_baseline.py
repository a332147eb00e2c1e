#!/usr/bin/env python
"""Measure the PyTorch reference's train-step throughput on THIS host's CPU.

Grounds bench.py's vs_baseline (BASELINE.md "Operational plan" step 1): the
reference publishes no numbers and this environment has no A100, so the one
apples-to-apples measurement available is reference-torch vs upnerf-jax on
the SAME CPU. This script RUNS the reference's own modules (sys.path import
from /root/reference — nothing is copied) through harness glue that mirrors
`NeRFSystem.training_step` (models/nerf_system.py:150-229) at the flagship
brandenburg_gate workload:

  2048 rays x (128 coarse + 128 importance) through both D=8/W=256 NeRFs
  + TransientNet, blended phase (sched_mult=0.5), UPNeRFLoss, backward,
  and both Adam steps.

Deviations (documented, both negligible): (a) the ray build from pixel
coords + se3 refine is replaced by a precomputed ray tensor — the
reference's utils/{ray,camera}.py need kornia/easydict which are not
installed here, and building 2048 rays is <1% of a step dominated by
786k MLP evaluations; se3/depth_scale tables still receive gradients via
the depth prior so both optimizers do real work. (b) no DataLoader — the
batch is resident, which only FAVORS the reference number.

Usage: python scripts/measure_torch_baseline.py [--steps 5] [--warmup 2]
Prints one JSON line with rays/s and the per-step wall time.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

REF = "/root/reference"


def build(N_images: int, device: str):
    from losses import UPNeRFLoss
    from models.nerf import NeRF
    from models.transient_net import TransientNet
    import torch

    kw = dict(
        encode_feat=True, feat_dim=384, xyz_L=10, dir_L=4,
        appearance_dim=48, candidate_dim=16, c2f=(0.1, 0.5),
    )
    models = {
        "nerf_coarse": NeRF("coarse", **kw).to(device),
        "nerf_fine": NeRF("fine", **kw).to(device),
    }
    transient = TransientNet(
        N_images=N_images, beta_min=0.1, trasient_dim=128, feat_dim=384
    ).to(device)
    embeddings = {
        k: torch.nn.Embedding(N_images, 48 if k.endswith("a") else 16).to(device)
        for k in ("coarse_a", "fine_a", "coarse_c", "fine_c")
    }
    se3_refine = torch.nn.Embedding(N_images, 6).to(device)
    depth_scale = torch.nn.Embedding(N_images, 2).to(device)
    torch.nn.init.zeros_(se3_refine.weight)
    torch.nn.init.zeros_(depth_scale.weight)
    loss_fn = UPNeRFLoss(depth_mult=1e-4, alpha_reg=1.0, encode_feat=True, fine=True)
    return models, transient, embeddings, se3_refine, depth_scale, loss_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--threads", type=int, default=0)
    args = ap.parse_args()

    sys.path.insert(0, REF)
    import torch

    if args.threads:
        torch.set_num_threads(args.threads)
    torch.manual_seed(0)
    device = "cpu"

    from models.rendering import render_rays

    N_images, B, Ns, Ni = 16, args.batch, 128, 128
    models, transient, embeddings, se3_refine, depth_scale, loss_fn = build(
        N_images, device
    )
    for m in models.values():
        m.progress.data.fill_(0.3)

    # mirrors configure_optimizers (models/nerf_system.py:41-73)
    nerf_params = []
    for m in list(models.values()) + [transient] + list(embeddings.values()):
        nerf_params += list(m.parameters())
    opt = torch.optim.Adam(nerf_params, lr=5e-4, eps=1e-8)
    opt_pose = torch.optim.Adam(
        list(se3_refine.parameters()) + list(depth_scale.parameters()), lr=2e-3
    )

    # flagship-shaped batch (random content; throughput is shape-driven)
    g = torch.Generator().manual_seed(1)
    rays_d = torch.nn.functional.normalize(
        torch.randn(B, 3, generator=g), dim=-1
    )
    rays = torch.cat(
        [torch.randn(B, 3, generator=g) * 0.1, rays_d,
         torch.full((B, 1), 0.1), torch.full((B, 1), 5.0)], 1
    ).to(device)
    img_idx = torch.randint(0, N_images, (B,), generator=g).to(device)
    rgbs = torch.rand(B, 3, generator=g).to(device)
    feats = torch.randn(B, 384, generator=g).to(device)
    inv_depths = (torch.rand(B, generator=g) * 5 + 0.2).to(device)
    sched_mult = 0.5  # blended phase: all heads live — the expensive program

    def step():
        # training_step body (models/nerf_system.py:150-229) minus ray build
        scale, shift = torch.unbind(depth_scale(img_idx), 1)
        pred_inv = inv_depths * torch.exp(scale) + shift
        pred_inv = torch.clamp(pred_inv, min=1.0 / 5.0)
        pred_depths = torch.clamp(1.0 / pred_inv, min=0.1)
        # make rays depend on se3 so opt_pose has real gradient work
        rays_live = rays + se3_refine(img_idx).sum(-1, keepdim=True) * 0.0

        results = render_rays(
            models=models, embeddings=embeddings, rays=rays_live,
            img_idx=img_idx, sched_mult=sched_mult, sched_phase=1,
            N_samples=Ns, use_disp=False, perturb=1.0, N_importance=Ni,
            white_back=False, encode_feat=True, validation=False,
        )
        t_results = transient(feats, img_idx)
        t_rgbs, t_alphas, t_betas = (
            t_results["rgb"], t_results["alpha"], t_results["beta"]
        )
        results["rgb_coarse"] = (
            results["s_rgb_coarse"] * (1 - t_alphas.detach())
            + t_rgbs.detach() * t_alphas.detach()
        )
        results["rgb_fine"] = (
            results["s_rgb_fine"] * (1 - t_alphas) + t_rgbs * t_alphas
        )
        results["t_beta"] = t_betas
        results["t_alpha"] = t_alphas

        loss_d = loss_fn(results, rgbs, feats, pred_depths, sched_mult)
        loss = sum(loss_d.values())
        opt.zero_grad()
        opt_pose.zero_grad()
        loss.backward()
        opt.step()
        opt_pose.step()
        return float(loss.detach())

    for _ in range(args.warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(args.steps):
        step()
    dt = (time.perf_counter() - t0) / args.steps

    print(json.dumps({
        "metric": "reference_torch_cpu_rays_per_sec",
        "value": round(B / dt, 2),
        "unit": "rays/s",
        "step_seconds": round(dt, 3),
        "threads": torch.get_num_threads(),
        "batch": B,
        "n_samples": [Ns, Ni],
    }))


if __name__ == "__main__":
    main()
