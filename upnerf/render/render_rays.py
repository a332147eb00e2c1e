"""Coarse+fine UP-NeRF volume renderer as one pure jit-friendly function.

Redesign of the reference render_rays (models/rendering.py:53-314):

- The schedule phase (candidate-only / blended / rgb-only) is a *static*
  argument; each phase is its own dead-code-free XLA program
  (the reference branches in Python on sched_mult at every call,
  models/rendering.py:133,195,268-298).
- Importance sampling draws a fixed N_importance from the mixture CDF
  (1 - m) * c_weights + m * s_weights instead of a dynamically-split pair of
  sample sets (models/rendering.py:276-290) — endpoint-identical and
  shape-static (intentional deviation, SURVEY.md §7.1 item 2).
- All randomness is explicit PRNG keys; det mode reproduces the reference's
  perturb=0 eval path (models/rendering.py:25-27).

Gradient-stopping placement matches the reference exactly: ray directions
are detached as MLP inputs (models/rendering.py:104-106), importance-weights
are detached (models/rendering.py:271,280,302-306).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from upnerf.models.nerf import NeRFConfig, apply_nerf

from . import volume
from .sampling import sample_pdf, stratified_z_vals


def _auto_fused(flag):
    if flag is not None:
        return bool(flag)
    import jax

    return jax.default_backend() == "tpu"


class RenderConfig(NamedTuple):
    """Static rendering hyperparameters."""

    N_samples: int = 128
    N_importance: int = 128
    use_disp: bool = False
    perturb: float = 1.0
    encode_feat: bool = True
    precision: str = "high"
    # Fuse trunk+heads+compositing into one Pallas kernel for the static
    # (phase-2) render path (upnerf.ops.pallas_render). Auto-on for TPU.
    fused_render: bool = False
    # Fully-fused TRAINING render (upnerf.ops.pallas_render_train): trunk +
    # heads + candidate + RGB + compositing, forward AND backward, all
    # phases. Per-sample tensors never reach HBM. Auto-on for TPU.
    fused_train: bool = False
    # Rematerialize the NeRF MLP in the backward pass. The flagship config
    # (2048 rays x 384 samples) fits a 16 GB v5e chip without remat and runs
    # ~1.25x faster that way (measured); enable for bigger batches/models.
    remat: bool = False
    # Fused-kernel numerics knobs (part of the static config so they are
    # visible to the jit / persistent-compile cache key — see
    # ops.pallas_render_train.RTStatic for what each one trades).
    store_f32: bool = True
    trunk_3x: bool = False
    # Save the walk chain (trunk acts + head intermediates) to HBM in the
    # fused forward so the fused backward skips the chain recompute —
    # trades MXU FLOPs for streamed HBM traffic (see RTStatic.save_chain).
    save_chain: bool = True
    # param_grads=False: the fused backward skips every parameter-gradient
    # (dW = x^T dy) computation and returns zero cotangents for the model
    # weights. Set by frozen-model consumers (TTO optimizes only the test
    # pose + appearance embedding) — pallas_call is opaque to XLA's DCE,
    # so dead dW work can only be elided inside the kernel. Not a yaml
    # knob; programmatic only (see RTStatic.param_grads).
    param_grads: bool = True

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "RenderConfig":
        return cls(
            N_samples=hp["nerf.N_samples"],
            N_importance=hp["nerf.N_importance"],
            use_disp=hp["nerf.use_disp"],
            perturb=hp["nerf.perturb"],
            encode_feat=hp["nerf.feat_dim"] > 0,
            precision=hp.get("tpu.matmul_precision", "high"),
            remat=hp.get("tpu.remat", False),
            fused_render=_auto_fused(hp.get("tpu.fused_render")),
            fused_train=_auto_fused(hp.get("tpu.fused_train")),
            store_f32=hp.get("tpu.store_f32", True),
            trunk_3x=hp.get("tpu.trunk_3x", False),
            save_chain=hp.get("tpu.save_chain", True),
        )


def _inference(
    results: Dict[str, jnp.ndarray],
    nerf_params: Dict[str, Any],
    nerf_cfg: NeRFConfig,
    typ: str,
    xyz: jnp.ndarray,  # (R, S, 3)
    z_vals: jnp.ndarray,  # (R, S)
    rays_d: jnp.ndarray,  # (R, 3)
    a_emb: Optional[jnp.ndarray],  # (R, A)
    c_emb: Optional[jnp.ndarray],  # (R, C)
    *,
    phase: int,
    sched_mult: jnp.ndarray,
    progress: jnp.ndarray,
    encode_candidate: bool,
    rcfg: "RenderConfig",
    det: bool = False,
    rays_o: Optional[jnp.ndarray] = None,  # (R, 3), fused_train path only
) -> None:
    """One NeRF evaluation + compositing pass (models/rendering.py:86-219).

    Mutates `results` with keys suffixed by `typ` ('coarse' | 'fine').
    """
    R, S = z_vals.shape
    precision, remat = rcfg.precision, rcfg.remat
    use_candidate = nerf_cfg.encode_candidate and encode_candidate and phase < 2
    # Forward-only (det) phase-2 renders — val / TTO eval / video. With
    # fused_train available, the TRAINING mega-kernel's forward is the
    # faster path: its in-kernel rays/PE frontend keeps the (R*S, 3+6L) PE
    # tensor out of HBM entirely, the trunk/heads run stage-major over ray
    # subgroups, and — called outside a grad context — only the primal
    # runs, so the save-for-backward residuals are never written
    # (pallas_render_train._fwd_impl save_res=False: VMEM scratch only).
    # The forward-only kernel (pallas_render) remains the fallback when
    # only fused_render is enabled.
    if (
        phase == 2
        and det
        and not use_candidate
        and nerf_cfg.encode_feat
        and nerf_cfg.encode_appearance
        and (rcfg.fused_render or rcfg.fused_train)
        and R % 8 == 0
    ):
        if rcfg.fused_train and rays_o is not None:
            _fused_train_path(
                results, nerf_params, nerf_cfg, typ, rays_o, z_vals, rays_d,
                a_emb, c_emb, phase=phase, progress=progress,
                rcfg=rcfg, use_candidate=False,
            )
        else:
            _fused_static_path(
                results, nerf_params, nerf_cfg, typ, xyz, z_vals, rays_d,
                a_emb, progress=progress, precision=precision,
            )
        return

    # Fully-fused TRAINING render: all phases, forward + backward in two
    # Pallas kernels (upnerf.ops.pallas_render_train) — per-sample tensors
    # never reach HBM (the round-1 step spent ~1/3 of its time on their
    # traffic, docs/ROADMAP.md).
    if rcfg.fused_train and nerf_cfg.encode_feat and R % 8 == 0:
        assert rays_o is not None
        _fused_train_path(
            results, nerf_params, nerf_cfg, typ, rays_o, z_vals, rays_d,
            a_emb, c_emb, phase=phase, progress=progress,
            rcfg=rcfg, use_candidate=use_candidate,
        )
        return

    inputs = {
        "input_xyz": xyz,
        # Per-RAY conditioning (apply_nerf broadcasts via split matmuls).
        # Directions are detached as MLP inputs: pose gradients flow only
        # through sample positions (models/rendering.py:104-106).
        "input_dir": jax.lax.stop_gradient(rays_d),
    }
    if nerf_cfg.encode_appearance:
        inputs["input_a"] = a_emb
    if nerf_cfg.encode_candidate and encode_candidate:
        inputs["input_c"] = c_emb

    def _apply(p, inp, sm, pr):
        return apply_nerf(
            p,
            nerf_cfg,
            inp,
            phase=phase,
            sched_mult=sm,
            progress=pr,
            encode_candidate=encode_candidate,
            precision=precision,
        )

    if remat:
        _apply = jax.checkpoint(_apply)
    out = _apply(nerf_params, inputs, sched_mult, progress)
    # out values have shape (R, S) for sigmas, (R, S, C) for feat/rgb.

    deltas = volume.deltas_from_z(z_vals)
    s_alphas = volume.alpha_from_sigma(out["s_sigma"], deltas)

    use_candidate = nerf_cfg.encode_candidate and encode_candidate and phase < 2
    if phase < 2:
        if not use_candidate:
            # No candidate head: composite static density only
            # (models/rendering.py:134-150).
            weights = volume.composite_weights(s_alphas)
            results[f"s_weights_{typ}"] = weights
            if nerf_cfg.encode_feat:
                results[f"feat_{typ}"] = volume.weighted_sum(weights, out["s_feat"])
            else:
                raise NotImplementedError(
                    "feature-less candidate-free phase<2 has no reference path"
                )
        else:
            # Joint static+candidate compositing (models/rendering.py:152-194).
            c_alphas = volume.alpha_from_sigma(out["c_sigma"], deltas)
            joint_alphas = volume.alpha_from_sigma(
                out["s_sigma"] + out["c_sigma"], deltas
            )
            transmittance = volume.transmittance_of(joint_alphas)
            s_weights = s_alphas * transmittance
            c_weights = c_alphas * transmittance
            weights = joint_alphas * transmittance
            results[f"c_weights_{typ}"] = weights
            results[f"c_depth_{typ}"] = volume.depth_map(weights, z_vals)
            if nerf_cfg.encode_feat:
                results[f"feat_{typ}"] = volume.weighted_sum(
                    s_weights, out["s_feat"]
                ) + volume.weighted_sum(c_weights, out["c_feat"])
            else:
                results[f"c_rgb_{typ}"] = volume.weighted_sum(
                    s_weights, out["s_rgb"]
                ) + volume.weighted_sum(c_weights, out["c_rgb"])
            results[f"t_weight_{typ}"] = c_weights.sum(-1)

    if phase > 0:
        # Static-only compositing for the shared RGB output
        # (models/rendering.py:195-209).
        only_s_weights = volume.composite_weights(s_alphas)
        results[f"s_weights_{typ}"] = only_s_weights
        results[f"s_rgb_{typ}"] = volume.weighted_sum(only_s_weights, out["s_rgb"])

    # Static-only expected depth, always (models/rendering.py:211-218).
    only_s_weights = volume.composite_weights(s_alphas)
    results[f"s_depth_{typ}"] = volume.depth_map(only_s_weights, z_vals)


def _fused_train_path(
    results, nerf_params, nerf_cfg, typ, rays_o, z_vals, rays_d, a_emb, c_emb,
    *, phase, progress, rcfg, use_candidate,
) -> None:
    """All-phase render through the fused training kernel
    (upnerf.ops.pallas_render_train): trunk + sigma/feat/candidate/rgb heads
    + both compositing branches fused, with a fully-fused custom VJP. The
    kernel's rays frontend builds xyz = o + d*z and the annealed PE
    in-kernel, so the (R*S, 63) PE tensor and its cotangent never touch
    HBM; pose gradients come back as d_rays_o / d_rays_d. Emits exactly
    the result keys the XLA path produces for the phase
    (models/rendering.py:125-218)."""
    import jax as _jax

    from upnerf.models.nerf import pe_weight, positional_encoding
    from upnerf.ops.pallas_render_train import (
        RTStatic,
        fused_render_train_rays,
    )

    R, S = z_vals.shape
    use_rgb = phase > 0
    out_feat = phase < 2
    w_xyz = (
        pe_weight(progress, nerf_cfg.xyz_L, nerf_cfg.c2f)
        if nerf_cfg.c2f is not None
        else jnp.ones((nerf_cfg.xyz_L,), jnp.float32)
    )

    heads = {
        "xyzf_w": nerf_params["xyz_final"]["w"],
        "xyzf_b": nerf_params["xyz_final"]["b"],
        "sigma_w": nerf_params["share_sigma"]["w"],
        "sigma_b": nerf_params["share_sigma"]["b"],
        "feat_w": nerf_params["feat_share"]["w"],
        "feat_b": nerf_params["feat_share"]["b"],
    }
    ray_cond = None
    if use_rgb:
        w_dir = (
            pe_weight(progress, nerf_cfg.dir_L, nerf_cfg.c2f)
            if nerf_cfg.c2f is not None
            else None
        )
        # Directions detached as MLP inputs (models/rendering.py:104-106).
        dir_pe = positional_encoding(
            _jax.lax.stop_gradient(rays_d), nerf_cfg.dir_L, w_dir
        )
        rgb1 = nerf_params["rgb_share"][0]
        fd = nerf_cfg.feat_dim
        dd = dir_pe.shape[-1]
        # split matmul: concat(feat, dir, a) @ W == feat@W0 + dir@W1 + a@W2
        ray_cond = dir_pe @ rgb1["w"][fd : fd + dd] + rgb1["b"]
        if nerf_cfg.encode_appearance and a_emb is not None:
            ray_cond = ray_cond + a_emb @ rgb1["w"][fd + dd :]
        heads["rgb1_w"] = rgb1["w"][:fd]
        heads["rgb2_w"] = nerf_params["rgb_share"][1]["w"]
        heads["rgb2_b"] = nerf_params["rgb_share"][1]["b"]
    if use_candidate:
        c1 = nerf_params["cand_enc"][0]
        W = nerf_cfg.W
        heads.update(
            c1x_w=c1["w"][:W], c1c_w=c1["w"][W:], c1_b=c1["b"],
            c2_w=nerf_params["cand_enc"][1]["w"],
            c2_b=nerf_params["cand_enc"][1]["b"],
            csig_w=nerf_params["cand_sigma"]["w"],
            csig_b=nerf_params["cand_sigma"]["b"],
            cfeat_w=nerf_params["cand_feat"]["w"],
            cfeat_b=nerf_params["cand_feat"]["b"],
        )
    trunk = tuple((p["w"], p["b"]) for p in nerf_params["trunk"])
    st = RTStatic(
        D=nerf_cfg.D, skips=tuple(nerf_cfg.skips), use_cand=use_candidate,
        use_rgb=use_rgb, out_feat=out_feat, precision=rcfg.precision,
        xyz_L=nerf_cfg.xyz_L, store_f32=rcfg.store_f32,
        trunk_3x=rcfg.trunk_3x,
        save_chain=rcfg.save_chain and not rcfg.trunk_3x,
        param_grads=rcfg.param_grads,
    )
    out = fused_render_train_rays(
        rays_o, rays_d, z_vals, w_xyz, ray_cond,
        c_emb if use_candidate else None, trunk, heads, st,
    )
    if phase < 2:
        if use_candidate:
            results[f"c_weights_{typ}"] = out["j_weights"]
            results[f"c_depth_{typ}"] = out["c_depth"]
            results[f"t_weight_{typ}"] = out["t_weight"]
        else:
            results[f"s_weights_{typ}"] = out["s_weights"]
        results[f"feat_{typ}"] = out["feat_map"]
    if phase > 0:
        results[f"s_weights_{typ}"] = out["s_weights"]
        results[f"s_rgb_{typ}"] = out["rgb_map"]
    results[f"s_depth_{typ}"] = out["s_depth"]


def _fused_static_path(
    results, nerf_params, nerf_cfg, typ, xyz, z_vals, rays_d, a_emb,
    *, progress, precision,
) -> None:
    """Phase-2 static render through the Pallas mega-kernel
    (upnerf.ops.pallas_render): trunk + sigma/feat/rgb heads + alpha
    compositing fused; emits the same result keys as the XLA path
    (s_weights/s_rgb/s_depth)."""
    from upnerf.models.nerf import pe_weight, positional_encoding
    from upnerf.ops.pallas_render import fused_static_render

    R, S = z_vals.shape
    w_xyz = (
        pe_weight(progress, nerf_cfg.xyz_L, nerf_cfg.c2f)
        if nerf_cfg.c2f is not None
        else None
    )
    x0 = positional_encoding(xyz, nerf_cfg.xyz_L, w_xyz).reshape(R * S, -1)

    w_dir = (
        pe_weight(progress, nerf_cfg.dir_L, nerf_cfg.c2f)
        if nerf_cfg.c2f is not None
        else None
    )
    dir_pe = positional_encoding(
        jax.lax.stop_gradient(rays_d), nerf_cfg.dir_L, w_dir
    )  # (R, 27)
    rgb1 = nerf_params["rgb_share"][0]
    feat_dim = nerf_cfg.feat_dim
    d_dir = dir_pe.shape[-1]
    # split matmul: concat(feat, dir_pe, a) @ W == feat@W0 + dir@W1 + a@W2
    ray_cond = (
        dir_pe @ rgb1["w"][feat_dim : feat_dim + d_dir]
        + a_emb @ rgb1["w"][feat_dim + d_dir :]
        + rgb1["b"]
    )

    trunk = tuple((p["w"], p["b"]) for p in nerf_params["trunk"])
    head = {
        "sigma_w": nerf_params["share_sigma"]["w"],
        "sigma_b": nerf_params["share_sigma"]["b"],
        "xyzf_w": nerf_params["xyz_final"]["w"],
        "xyzf_b": nerf_params["xyz_final"]["b"],
        "feat_w": nerf_params["feat_share"]["w"],
        "feat_b": nerf_params["feat_share"]["b"],
        "rgb1_w": rgb1["w"][:feat_dim],
        "rgb2_w": nerf_params["rgb_share"][1]["w"],
        "rgb2_b": nerf_params["rgb_share"][1]["b"],
    }
    rgb_map, depth, weights = fused_static_render(
        x0, z_vals, ray_cond, trunk, head, nerf_cfg.skips, 8, precision
    )
    results[f"s_weights_{typ}"] = weights
    results[f"s_rgb_{typ}"] = rgb_map
    results[f"s_depth_{typ}"] = depth[:, 0]


def render_rays(
    params: Dict[str, Any],
    cfg: RenderConfig,
    nerf_cfg: NeRFConfig,
    rays: jnp.ndarray,  # (R, 8): o, d, near, far
    img_idx: jnp.ndarray,  # (R,) int
    *,
    key: Optional[jax.Array],
    phase: int,
    sched_mult: jnp.ndarray,
    progress: jnp.ndarray,
    encode_candidate: bool = True,
    det: bool = False,
    noise: Optional[Dict[str, jnp.ndarray]] = None,
) -> Dict[str, jnp.ndarray]:
    """Render a ray batch (models/rendering.py:53-314).

    params: {"nerf_coarse", "nerf_fine", "embeddings": {"coarse_a",
    "fine_a", "coarse_c", "fine_c"}} — embeddings are (N_images, dim) tables
    gathered by img_idx (models/rendering.py:256-258, 309-312).
    det=True gives the deterministic eval path (no perturb, linspace CDF
    samples). `noise` optionally supplies the pre-drawn uniforms
    {"coarse": (R, N_samples), "fine": (R, N_importance)} in place of
    `key`; the shard_map train step draws them ONCE at global batch shape
    and shards them along rays, so the per-ray randomness of a sharded
    step is bit-identical to the single-device step.
    """
    R = rays.shape[0]
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    emb = params["embeddings"]

    if key is None and noise is None:
        det = True
    k_coarse, k_fine = (
        jax.random.split(key) if key is not None else (None, None)
    )
    noise = noise or {}

    z_vals = stratified_z_vals(
        k_coarse,
        near,
        far,
        cfg.N_samples,
        use_disp=cfg.use_disp,
        perturb=0.0 if det else cfg.perturb,
        u=noise.get("coarse"),
    )
    # z has no trainable ancestry anywhere in the training path (coarse z
    # comes from the scene near/far constants; fine z passes through
    # stop_gradient'ed importance weights — models/rendering.py:271,280).
    # Cutting its dead gradient chain here matters on TPU: the VJP of the
    # merged-z sort otherwise lowers to a serialized 524k-element scatter
    # (~4.6 ms/step, 9% of the flagship step) computing cotangents that
    # end at non-trainable leaves. Pose gradients are unaffected — they
    # flow through rays_o/rays_d VALUES (d xyz/d o = 1, d xyz/d d = z).
    z_vals = jax.lax.stop_gradient(z_vals)
    xyz_coarse = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]

    results: Dict[str, jnp.ndarray] = {}

    def emb_for(prefix: str, name: str):
        table = emb.get(f"{prefix}_{name}")
        return None if table is None else table[img_idx]

    _inference(
        results,
        params["nerf_coarse"],
        nerf_cfg,
        "coarse",
        xyz_coarse,
        z_vals,
        rays_d,
        emb_for("coarse", "a"),
        emb_for("coarse", "c"),
        phase=phase,
        sched_mult=sched_mult,
        progress=progress,
        encode_candidate=encode_candidate,
        rcfg=cfg,
        det=det,
        rays_o=rays_o,
    )

    if cfg.N_importance > 0:
        z_mid = 0.5 * (z_vals[:, :-1] + z_vals[:, 1:])  # (R, S-1)
        use_candidate = nerf_cfg.encode_candidate and encode_candidate
        if use_candidate and phase == 0:
            w_src = results["c_weights_coarse"]
        elif use_candidate and phase == 1:
            # Mixture CDF replaces the dynamic sample split
            # (models/rendering.py:276-290); see module docstring.
            w_src = (1.0 - sched_mult) * results["c_weights_coarse"] + (
                sched_mult * results["s_weights_coarse"]
            )
        else:
            w_src = results["s_weights_coarse"]
        z_samples = sample_pdf(
            k_fine,
            z_mid,
            jax.lax.stop_gradient(w_src[:, 1:-1]),
            cfg.N_importance,
            det=det,
            u=noise.get("fine"),
        )
        z_fine = jax.lax.stop_gradient(volume.merge_sorted_z(z_vals, z_samples))
        xyz_fine = rays_o[:, None, :] + rays_d[:, None, :] * z_fine[..., None]
        _inference(
            results,
            params["nerf_fine"],
            nerf_cfg,
            "fine",
            xyz_fine,
            z_fine,
            rays_d,
            emb_for("fine", "a"),
            emb_for("fine", "c"),
            phase=phase,
            sched_mult=sched_mult,
            progress=progress,
            encode_candidate=encode_candidate,
            rcfg=cfg,
            det=det,
            rays_o=rays_o,
        )
    return results
