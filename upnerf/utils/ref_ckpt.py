"""Trained-checkpoint interop with the reference, BOTH directions.

Forward (`convert_*`): reference Lightning .ckpt -> our run directory.
Reverse (`export_*`): our run directory -> a reference-style Lightning
.ckpt (for users comparing in reference tooling or migrating back).

The reference trains with PyTorch Lightning; its checkpoints hold a flat
``state_dict`` keyed by the NeRFSystem attribute names
(models/nerf_system.py:340-409: ``nerf_coarse.*``, ``nerf_fine.*``,
``transient_net.*``, ``embedding_{coarse,fine}_{a,c}.weight``,
``se3_refine.weight``, ``depth_scale.weight``), plus Lightning's
``hyper_parameters`` (the same flat dotted-key dict this repo's config
system reads) and ``global_step``. This module maps that state_dict onto
our parameter pytree (upnerf/train/state.py:init_params layout, transposing
torch's (out, in) Linear weights to our (in, out)) and can write a
framework-native orbax checkpoint directory that the tto/eval/render CLIs
restore directly — so a reference user can bring a TRAINED model across
without retraining.

Optimizer states are NOT carried over (torch Adam moments don't map onto
optax trees across the transpose); converted runs restart optimization
fresh, which only matters if training is resumed rather than evaluated.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _linear(sd: Dict[str, Any], prefix: str) -> Dict[str, np.ndarray]:
    return {
        "w": _np(sd[f"{prefix}.weight"]).T.copy(),
        "b": _np(sd[f"{prefix}.bias"]),
    }


def convert_nerf(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    """One reference NeRF module (models/nerf.py:38-78) -> init_nerf layout."""
    depth = 0
    while f"{prefix}.xyz_encoding_{depth + 1}.0.weight" in sd:
        depth += 1
    assert depth > 0, f"no trunk layers under '{prefix}.' — wrong prefix?"
    p: Dict[str, Any] = {
        "trunk": [
            _linear(sd, f"{prefix}.xyz_encoding_{i + 1}.0")
            for i in range(depth)
        ],
        "xyz_final": _linear(sd, f"{prefix}.xyz_encoding_final"),
        "share_sigma": _linear(sd, f"{prefix}.share_sigma.0"),
        "rgb_share": [
            _linear(sd, f"{prefix}.rgb_share_layer.0"),
            _linear(sd, f"{prefix}.rgb_share_layer.2"),
        ],
    }
    if f"{prefix}.feat_share_layer.weight" in sd:
        p["feat_share"] = _linear(sd, f"{prefix}.feat_share_layer")
    if f"{prefix}.candidate_encoding.0.weight" in sd:
        p["cand_enc"] = [
            _linear(sd, f"{prefix}.candidate_encoding.0"),
            _linear(sd, f"{prefix}.candidate_encoding.2"),
        ]
        p["cand_sigma"] = _linear(sd, f"{prefix}.candidate_sigma.0")
        if f"{prefix}.feat_candidate_layer.weight" in sd:
            p["cand_feat"] = _linear(sd, f"{prefix}.feat_candidate_layer")
        else:
            p["cand_rgb"] = _linear(sd, f"{prefix}.rgb_candidate_layer")
    return p


def convert_transient(sd: Dict[str, Any], prefix: str = "transient_net") -> Dict[str, Any]:
    """Reference TransientNet (models/transient_net.py:5-25) ->
    init_transient layout."""
    return {
        "t_emb": _np(sd[f"{prefix}.embedding_t.weight"]),
        "feat_encoder": [
            _linear(sd, f"{prefix}.feat_encoder.{2 * i}") for i in range(4)
        ],
        "final_encoder": _linear(sd, f"{prefix}.final_encoder"),
        "t_encoder": _linear(sd, f"{prefix}.t_encoder.0"),
        "alpha_layer": _linear(sd, f"{prefix}.alpha_layer.0"),
        "beta_layer": _linear(sd, f"{prefix}.beta_layer.0"),
        "rgb_layer": _linear(sd, f"{prefix}.rgb_layer.0"),
    }


def convert_state_dict(
    sd: Dict[str, Any],
) -> Tuple[Dict[str, Any], Dict[str, np.ndarray], Dict[str, Any]]:
    """Full NeRFSystem state_dict -> (params, pose_params, meta).

    params/pose_params mirror upnerf.train.state.init_params /
    init_pose_params; meta carries the BARF progress scalar and counts.
    """
    params: Dict[str, Any] = {"nerf_coarse": convert_nerf(sd, "nerf_coarse")}
    if "nerf_fine.xyz_encoding_1.0.weight" in sd:
        params["nerf_fine"] = convert_nerf(sd, "nerf_fine")
    if "transient_net.embedding_t.weight" in sd:
        params["transient"] = convert_transient(sd)

    emb: Dict[str, np.ndarray] = {}
    for ours, theirs in (
        ("coarse_a", "embedding_coarse_a"),
        ("fine_a", "embedding_fine_a"),
        ("coarse_c", "embedding_coarse_c"),
        ("fine_c", "embedding_fine_c"),
    ):
        if f"{theirs}.weight" in sd:
            emb[ours] = _np(sd[f"{theirs}.weight"])
    params["embeddings"] = emb

    pose_params = {
        "se3": _np(sd["se3_refine.weight"]),
        "depth_scale": _np(sd["depth_scale.weight"]),
    }
    meta = {
        "progress": float(_np(sd["nerf_coarse.progress"]))
        if "nerf_coarse.progress" in sd
        else None,
        "n_images": int(pose_params["se3"].shape[0]),
    }
    return params, pose_params, meta


def load_reference_ckpt(path: str):
    """torch.load a Lightning .ckpt -> (state_dict, hparams|None, step)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt)
    hparams = ckpt.get("hyper_parameters")
    if hparams is not None:
        hparams = dict(hparams)
    return sd, hparams, int(ckpt.get("global_step", 0))


def write_framework_ckpt(
    result_dir: str,
    hparams: Dict[str, Any],
    params: Dict[str, Any],
    pose_params: Dict[str, np.ndarray],
    n_images: int,
    step: int,
) -> None:
    """Emit ``result_dir/{config.yaml, ckpts/}`` restorable by
    upnerf.cli.{tto,eval,render_video} (their load path is
    build_train_state + CheckpointManager.restore; see cli/tto.py)."""
    import jax
    import jax.numpy as jnp

    from upnerf.config import save_yaml
    from upnerf.train.state import build_train_state
    from upnerf.utils.ckpt import CheckpointManager

    state = build_train_state(hparams, n_images)
    ref_struct = jax.tree.structure(state.params)
    got_struct = jax.tree.structure(jax.tree.map(jnp.asarray, params))
    assert ref_struct == got_struct, (
        "converted param tree does not match the config's model structure:\n"
        f"config -> {ref_struct}\nckpt   -> {got_struct}"
    )
    state = state._replace(
        step=jnp.asarray(step, jnp.int32),
        params=jax.tree.map(jnp.asarray, params),
        pose_params=jax.tree.map(jnp.asarray, pose_params),
    )
    os.makedirs(result_dir, exist_ok=True)
    save_yaml(hparams, os.path.join(result_dir, "config.yaml"))
    mngr = CheckpointManager(os.path.join(result_dir, "ckpts"))
    mngr.save(step, state)
    mngr.close()


def _check_scene_image_count(hparams, n_images: int, log) -> None:
    """Fail early, with a readable message, when the checkpoint's per-image
    tables (sized N_images_train by the reference, nerf_system.py:341,406)
    don't match the scene the config points at — otherwise the mismatch
    only surfaces as a deep orbax shape error inside `tto`/`eval`."""
    try:
        from upnerf.data import load_scene_meta

        meta = load_scene_meta(hparams)
    except Exception as e:  # scene data may live on another host
        log(
            f"note: scene not loadable here ({e!r}); skipping the "
            f"image-count cross-check (tables cover {n_images} images)"
        )
        return
    if meta.N_images_train != n_images:
        raise SystemExit(
            f"checkpoint tables cover {n_images} images but the scene at "
            f"{hparams.get('root_dir')!r} has {meta.N_images_train} train "
            "images — the checkpoint was trained on a different scene/"
            "split (tto/eval would fail to restore it)"
        )


# --- reverse direction: our run -> reference Lightning checkpoint --------


def export_state_dict(
    params: Dict[str, Any],
    pose_params: Dict[str, Any],
    progress: float,
):
    """Our param pytree -> the reference's flat NeRFSystem state_dict
    (exact inverse of convert_state_dict: torch (out, in) Linear layout,
    the NeRFSystem attribute names of models/nerf_system.py:340-409, and
    the BARF `progress` nn.Parameter of models/nerf.py:36)."""
    import torch

    sd: Dict[str, Any] = {}

    def put_linear(prefix: str, p: Dict[str, Any]) -> None:
        w = np.ascontiguousarray(np.asarray(p["w"], np.float32).T)
        sd[f"{prefix}.weight"] = torch.from_numpy(w)
        sd[f"{prefix}.bias"] = torch.from_numpy(
            np.asarray(p["b"], np.float32).copy()
        )

    def put_table(key: str, arr) -> None:
        sd[key] = torch.from_numpy(np.asarray(arr, np.float32).copy())

    for typ in ("nerf_coarse", "nerf_fine"):
        p = params.get(typ)
        if p is None:
            continue
        sd[f"{typ}.progress"] = torch.tensor(float(progress))
        for i, lay in enumerate(p["trunk"]):
            put_linear(f"{typ}.xyz_encoding_{i + 1}.0", lay)
        put_linear(f"{typ}.xyz_encoding_final", p["xyz_final"])
        put_linear(f"{typ}.share_sigma.0", p["share_sigma"])
        put_linear(f"{typ}.rgb_share_layer.0", p["rgb_share"][0])
        put_linear(f"{typ}.rgb_share_layer.2", p["rgb_share"][1])
        if "feat_share" in p:
            put_linear(f"{typ}.feat_share_layer", p["feat_share"])
        if "cand_enc" in p:
            put_linear(f"{typ}.candidate_encoding.0", p["cand_enc"][0])
            put_linear(f"{typ}.candidate_encoding.2", p["cand_enc"][1])
            put_linear(f"{typ}.candidate_sigma.0", p["cand_sigma"])
            if "cand_feat" in p:
                put_linear(f"{typ}.feat_candidate_layer", p["cand_feat"])
            elif "cand_rgb" in p:
                put_linear(f"{typ}.rgb_candidate_layer", p["cand_rgb"])

    t = params.get("transient")
    if t is not None:
        put_table("transient_net.embedding_t.weight", t["t_emb"])
        for i, lay in enumerate(t["feat_encoder"]):
            put_linear(f"transient_net.feat_encoder.{2 * i}", lay)
        put_linear("transient_net.final_encoder", t["final_encoder"])
        put_linear("transient_net.t_encoder.0", t["t_encoder"])
        put_linear("transient_net.alpha_layer.0", t["alpha_layer"])
        put_linear("transient_net.beta_layer.0", t["beta_layer"])
        put_linear("transient_net.rgb_layer.0", t["rgb_layer"])

    for ours, theirs in (
        ("coarse_a", "embedding_coarse_a"),
        ("fine_a", "embedding_fine_a"),
        ("coarse_c", "embedding_coarse_c"),
        ("fine_c", "embedding_fine_c"),
    ):
        arr = params.get("embeddings", {}).get(ours)
        if arr is not None:
            put_table(f"{theirs}.weight", arr)

    put_table("se3_refine.weight", pose_params["se3"])
    put_table("depth_scale.weight", pose_params["depth_scale"])
    return sd


def export_framework_run(
    result_dir: str,
    out_path: str,
    ckpt: str = "last",
    log=print,
) -> None:
    """One-call reverse migration: our run directory -> a reference-style
    Lightning .ckpt (state_dict + hyper_parameters + global_step) that the
    reference's `load_ckpt`/`extract_model_state_dict` utilities
    (utils/__init__.py:4-26) and its tto/eval tooling read. Weights/tables
    only — torch optimizer states are not synthesized, so reference-side
    TRAINING resume restarts optimization (same caveat as the forward
    direction, inverted)."""
    import torch

    from upnerf.config import get_from_path
    from upnerf.utils.ckpt import CheckpointManager

    hparams = get_from_path(os.path.join(result_dir, "config.yaml"))
    mngr = CheckpointManager(os.path.join(result_dir, "ckpts"))
    step = mngr.best_step() if ckpt == "best" else mngr.latest_step()
    assert step is not None, f"no checkpoint under {result_dir}/ckpts"
    # Restore WITHOUT a target: avoids needing the scene data (the table
    # sizes live in the checkpoint itself).
    raw = mngr.restore_raw(step)
    mngr.close()
    params, pose_params = raw["params"], raw["pose_params"]

    # Our schedule progress is step/max_steps; the reference persists the
    # same 0->1 quantity in the `progress` parameter and doubles
    # global_step under pose optimization (Lightning counts both optimizer
    # steps; train.py:59-62, models/nerf_system.py:222-224).
    progress = min(float(step) / float(hparams["max_steps"]), 1.0)
    global_step = int(step) * (2 if hparams.get("pose.optimize", True) else 1)
    sd = export_state_dict(params, pose_params, progress)
    out = {
        "state_dict": sd,
        "hyper_parameters": dict(hparams),
        "global_step": global_step,
        "epoch": 0,
        "pytorch-lightning_version": "1.9.0",
    }
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    torch.save(out, out_path)
    log(
        f"exported step-{step} state ({len(sd)} tensors, "
        f"progress={progress:.4f}) -> {out_path}"
    )


def convert_reference_run(
    ckpt_path: str,
    result_dir: str,
    config_path: Optional[str] = None,
    log=print,
) -> None:
    """One-call migration: reference .ckpt -> framework run directory.

    hparams come from --config when given, else from the checkpoint's own
    Lightning ``hyper_parameters`` (the reference and this repo share the
    flat dotted-key config schema)."""
    sd, ckpt_hparams, global_step = load_reference_ckpt(ckpt_path)
    params, pose_params, meta = convert_state_dict(sd)
    if config_path is not None:
        from upnerf.config import get_from_path

        hparams = get_from_path(config_path)
    elif ckpt_hparams is not None:
        hparams = ckpt_hparams
    else:
        raise SystemExit(
            "checkpoint has no hyper_parameters; pass --config <yaml>"
        )
    _check_scene_image_count(hparams, meta["n_images"], log)
    # Lightning counts each of the two optimizer steps under pose
    # optimization, so the reference's global_step is 2x the number of
    # BATCHES (train.py:59-62; progress normalized by max_steps*2,
    # models/nerf_system.py:222-224). Our `step` counts batches — halve
    # accordingly (the reverse exporter applies the inverse mapping, so
    # model -> export round-trips), and cross-check against the
    # checkpoint's own BARF `progress` scalar, which the schedules
    # actually consumed.
    step = (
        global_step // 2
        if hparams.get("pose.optimize", True)
        else global_step
    )
    if meta["progress"] and hparams.get("max_steps"):
        from_progress = meta["progress"] * float(hparams["max_steps"])
        if abs(from_progress - step) > max(1.0, 0.01 * step):
            log(
                f"note: checkpoint progress={meta['progress']:.4f} implies "
                f"step ~{from_progress:.0f} but global_step maps to {step}; "
                "keeping the global_step mapping (schedules resume from "
                "`step`, so a mismatch shifts the anneal)"
            )
    write_framework_ckpt(
        result_dir, hparams, params, pose_params, meta["n_images"], step
    )
    log(
        f"converted step-{step} checkpoint ({meta['n_images']} images, "
        f"progress={meta['progress']}) -> {result_dir}"
    )
