"""TTO failure diagnosis (round-4 VERDICT #1).

The tto_quality protocol fails (post-TTO right-half PSNR ~12 vs val ~23)
even though training poses converge. This script bisects the chain on a
finished protocol run:

  D1 TRAIN-CONTROL: render 4 TRAIN images through the *TTO render path*
     (make_tto_eval) at their LEARNED poses with their TRAINED embeddings.
     If this is ~val PSNR, the TTO render machinery (grouped rays, phase-2
     flags, coarse_a placeholder, masking) is fine; if it's ~12, the bug
     is in the TTO render path itself.
  D2 TEST@INIT: render the 4 test images at the sim3-aligned init poses
     with a TRAINED embedding (nearest train row). Measures how good the
     alignment alone is.
  D3 TEST@INIT fresh emb: same but a fresh random embedding (phase-A
     epoch-0 state).

Usage: python scripts/diag_tto.py [--run outputs_validation/out_tto/synth/tto_seed777]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--run", default="outputs_validation/out_tto/synth/tto_seed777")
    ap.add_argument("--out", default="outputs_validation/diag_tto")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from PIL import Image

    from upnerf.cli.tto import load_trained
    from upnerf.data.images import load_rgb_u8
    from upnerf.evaluate.tto import (
        TTOConfig, TTOGroup, align_test_poses, make_tto_eval,
        tto_region_size, _masked_psnr,
    )
    from upnerf.geometry import se3
    from upnerf.models import NeRFConfig, init_embedding
    from upnerf.render import RenderConfig

    hparams, state, meta = load_trained(args.run, "last")
    os.makedirs(args.out, exist_ok=True)

    se3_table = np.asarray(state.pose_params["se3"])
    gt_train = np.stack([np.asarray(meta.GT_poses_dict[i], np.float32)
                         for i in meta.img_ids_train])
    gt_test = np.stack([np.asarray(meta.GT_poses_dict[i], np.float32)
                        for i in meta.img_ids_test])
    base_train = np.stack([np.asarray(meta.poses_dict[i], np.float32)
                           for i in meta.img_ids_train])
    aligned_test = align_test_poses(se3_table, gt_train, gt_test,
                                    base_train_poses=base_train)
    learned_train = np.asarray(
        se3.compose([se3.se3_to_SE3(jnp.asarray(se3_table)),
                     jnp.asarray(base_train)]))

    nerf_cfg = NeRFConfig.from_hparams(hparams)
    cfg = TTOConfig(
        nerf=nerf_cfg,
        render=RenderConfig.from_hparams(hparams)._replace(
            perturb=1.0, param_grads=False),
    )
    frozen = {
        "nerf_coarse": state.params["nerf_coarse"],
        "nerf_fine": state.params["nerf_fine"],
        "embeddings": state.params["embeddings"],
    }
    fine_a = np.asarray(state.params["embeddings"]["fine_a"])
    A = fine_a.shape[-1]
    nf = jnp.array([[hparams["nerf.near"], hparams["nerf.far"]]])

    def build_group(ids, poses):
        imgs, Ks, whs = [], [], []
        for id_ in ids:
            img = load_rgb_u8(
                os.path.join(meta.image_dir, meta.image_paths[id_]), meta.scale)
            imgs.append(img)
            Ks.append(meta.Ks[id_])
            whs.append([img.shape[1], img.shape[0]])
        Hm = max(i.shape[0] for i in imgs)
        Wm = max(i.shape[1] for i in imgs)
        rgbs = np.zeros((len(imgs), Hm, Wm, 3), np.uint8)
        for i, img in enumerate(imgs):
            rgbs[i, : img.shape[0], : img.shape[1]] = img
        return TTOGroup(
            Ks=jnp.asarray(np.stack(Ks), jnp.float32),
            base_poses=jnp.asarray(poses, jnp.float32),
            rgbs=jnp.asarray(rgbs),
            wh=jnp.asarray(np.asarray(whs), jnp.int32),
            near_far=jnp.tile(nf, (len(imgs), 1)),
        )

    eval_full = make_tto_eval(frozen, cfg, x_frac=(0.0, 1.0))

    def run_case(name, group, emb):
        wh = np.asarray(group.wh)
        Hm, Wm = tto_region_size(wh, (0.0, 1.0))
        trainables = {"fine_a": jnp.asarray(emb)}
        preds, gts = eval_full(trainables, group, Hm, Wm)
        ps = _masked_psnr(preds, gts, wh, (0.0, 1.0))
        print(f"[diag] {name}: psnr per-image {np.round(ps, 2)} "
              f"mean {ps.mean():.2f}", flush=True)
        p = np.asarray(preds)
        g = np.asarray(gts)
        for i in range(p.shape[0]):
            w, h = int(wh[i, 0]), int(wh[i, 1])
            pair = np.concatenate([p[i, :h, :w], g[i, :h, :w]], axis=1)
            Image.fromarray(
                (np.clip(pair, 0, 1) * 255).astype(np.uint8)
            ).save(os.path.join(args.out, f"{name}_{i}.png"))
        return ps

    # D1: train-control — 4 train views at learned poses, trained embeddings
    tr_sel = [0, 10, 20, 31]
    tr_ids = [meta.img_ids_train[i] for i in tr_sel]
    g1 = build_group(tr_ids, learned_train[tr_sel])
    run_case("D1_train_control", g1, fine_a[tr_sel])

    # D2: test views at aligned init poses, trained embedding (nearest train)
    # interleaved test views: nearest train index by GT camera center
    ctr_tr = gt_train[:, :, 3]
    ctr_te = gt_test[:, :, 3]
    nearest = [int(np.argmin(((ctr_tr - c) ** 2).sum(1))) for c in ctr_te]
    print(f"[diag] nearest train idx per test view: {nearest}")
    g2 = build_group(meta.img_ids_test, aligned_test)
    run_case("D2_test_at_init_trained_emb", g2, fine_a[nearest])

    # D3: test views at aligned init poses, fresh random embedding
    emb0 = init_embedding(jax.random.PRNGKey(0), len(meta.img_ids_test), A)
    run_case("D3_test_at_init_fresh_emb", g2, emb0)

    # D4: test views at nearest TRAIN learned pose (ignore alignment) —
    # bounds how far the aligned init is from a pose that surely renders
    g3 = build_group(meta.img_ids_test, learned_train[nearest])
    run_case("D4_test_at_nearest_train_pose", g3, fine_a[nearest])


if __name__ == "__main__":
    main()
