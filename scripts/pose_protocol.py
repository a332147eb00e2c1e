"""Seed-protocoled pose-recovery benchmarks (VERDICT r2 next #5).

The repo's pose-recovery claims (perturbation recovery on the textured
16-view ring; identity-init recovery on the 32-view 90-degree arc) were
previously argued from 1-2 runs per configuration. This script runs each
recipe across >=3 training seeds and reports median/min/max of the final
gauge-free pose errors, so every DESIGN.md claim can be (re)stated from a
distribution instead of a point sample. Judge convergence ONLY by
train/pose_R_rel / pose_t_rel (the Procrustes numbers are
reflection-bistable on camera rings — docs/DESIGN.md "Pose metric audit").

Runs serially on the TPU (never run two TPU jobs concurrently — CLAUDE.md).

Usage (from the repo root):
  python scripts/pose_protocol.py --recipe pose --steps 15000
  python scripts/pose_protocol.py --recipe identity --steps 60000
  # options: --seeds 42,777,1234   --tag mylabel

Writes benchmarks/pose_protocol_<recipe><tag>.json (a COMMITTED path —
the scenes/runs under outputs_validation/ are gitignored scratch, but the
protocol summaries are benchmark evidence and travel with the repo) and
prints a summary table. Each run records its full (step, rel-R, rel-t)
descent trace so the curves are auditable without the run directories.
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RECIPES = {
    # CLAUDE.md protocol: synth_pose + pose.noise 0.15 + >=15k steps on a
    # feat_hw=32 scene (expect rel-R ~17 deg -> 1-4 deg; the final
    # fine-alignment is basin/seed-dependent below ~5 deg).
    "pose": {
        "config": "configs/validation/synth_pose.yaml",
        "scene_dir": "outputs_validation/scene_pose32",
        "scene_kwargs": dict(
            n_train=16, n_test=2, H=64, W=80, feat_hw=32, feat_dim=32,
            focal=80.0, arc=0.5,
        ),
        "overrides": {"pose.noise": 0.15},
        "default_steps": 15000,
    },
    # DESIGN.md "Identity-init pose recovery": 32-view 90-degree arc,
    # world-anchored features, identity pose init (expect 29.1 -> ~9.5 deg
    # at 128x160; the plateau claim is what the seed spread qualifies).
    "identity": {
        "config": "configs/validation/synth_identity.yaml",
        "scene_dir": "outputs_validation/scene_identity",
        "scene_kwargs": dict(
            n_train=32, n_test=2, H=128, W=160, feat_hw=32, feat_dim=32,
            focal=160.0, arc=0.25, feature_mode="world",
        ),
        "overrides": {},
        "default_steps": 60000,
    },
    # DESIGN.md "Resolution x coverage study": 2x resolution AND 2x ray
    # budget break the old 9.2-deg floor (expect ~7 deg at 90k steps,
    # still descending; batch 1024 at this resolution REGRESSES to ~12.6).
    "identity_hires": {
        "config": "configs/validation/synth_identity.yaml",
        "scene_dir": "outputs_validation/scene_identity_hi",
        "scene_kwargs": dict(
            n_train=32, n_test=2, H=256, W=320, feat_hw=64, feat_dim=32,
            focal=320.0, arc=0.25, feature_mode="world",
        ),
        "overrides": {"train.batch_size": 2048},
        "default_steps": 90000,
    },
    # VERDICT r4 accuracy lever: a LONGER coarse-to-fine PE anneal
    # (pose.c2f [0.1, 0.8] vs the reference's [0.1, 0.5],
    # models/nerf.py:126-147) keeps the photometric pose basin wide
    # through most of the blend phase — testing whether the 150k-schedule
    # 4.4-7.6 deg basins are set by premature PE sharpening.
    "identity_hires_c2f": {
        "config": "configs/validation/synth_identity.yaml",
        "scene_dir": "outputs_validation/scene_identity_hi",
        "scene_kwargs": dict(
            n_train=32, n_test=2, H=256, W=320, feat_hw=64, feat_dim=32,
            focal=320.0, arc=0.25, feature_mode="world",
        ),
        "overrides": {"train.batch_size": 2048, "pose.c2f": (0.1, 0.8)},
        "default_steps": 90000,
    },
    # Generality check of the winning r4 lever: does the LONGER PE anneal
    # also help when poses start NEAR the solution (noise 0.15) instead of
    # at identity? The perturbation-recovery descent is driven by fine
    # photometric alignment, so the wide-basin anneal could plausibly be
    # neutral or even slow it — measure, don't assume.
    "pose_c2f": {
        "config": "configs/validation/synth_pose.yaml",
        "scene_dir": "outputs_validation/scene_pose32",
        "scene_kwargs": dict(
            n_train=16, n_test=2, H=64, W=80, feat_hw=32, feat_dim=32,
            focal=80.0, arc=0.5,
        ),
        "overrides": {"pose.noise": 0.15, "pose.c2f": (0.1, 0.8)},
        "default_steps": 15000,
    },
    # Next point on the anneal-length response curve: [0.1, 0.5] -> 7.03
    # deg and [0.1, 0.8] -> 5.86 deg at 90k (every seed improved), so test
    # whether [0.1, 0.9] keeps descending or whether 10% of the run at
    # full PE sharpness is too little fine-refinement time.
    "identity_hires_c2f9": {
        "config": "configs/validation/synth_identity.yaml",
        "scene_dir": "outputs_validation/scene_identity_hi",
        "scene_kwargs": dict(
            n_train=32, n_test=2, H=256, W=320, feat_hw=64, feat_dim=32,
            focal=320.0, arc=0.25, feature_mode="world",
        ),
        "overrides": {"train.batch_size": 2048, "pose.c2f": (0.1, 0.9)},
        "default_steps": 90000,
    },
    # VERDICT r4 accuracy lever #2: feature-space coarse-to-fine — early
    # training supervises against a Gaussian-smoothed pyramid level of
    # the feature stack (sigma 3 cells on the 64x64 grid), blending to
    # full resolution by 70% of the run (upnerf/train/step.py
    # gather_feats; default.yaml `feat:`).
    "identity_hires_featc2f": {
        "config": "configs/validation/synth_identity.yaml",
        "scene_dir": "outputs_validation/scene_identity_hi",
        "scene_kwargs": dict(
            n_train=32, n_test=2, H=256, W=320, feat_hw=64, feat_dim=32,
            focal=320.0, arc=0.25, feature_mode="world",
        ),
        "overrides": {"train.batch_size": 2048,
                      "feat.c2f": (0.0, 0.7), "feat.pyramid_sigma": 3.0},
        "default_steps": 90000,
    },
}


def artifact_path(recipe_name: str, tag: str) -> str:
    return os.path.join(
        "benchmarks", f"pose_protocol_{recipe_name}{tag}.json"
    )


def load_prior_runs(path: str, recipe_name: str, steps: int) -> dict:
    """Completed per-seed results from an existing (possibly partial)
    protocol artifact, keyed by seed.

    The run directories under outputs_validation/ are wiped with the
    scratch between sessions, but the committed artifact survives — so a
    protocol invocation that died mid-way (e.g. 2 of 3 seeds done) can be
    re-issued and only train the missing seeds. Only runs measured under
    the SAME recipe and schedule are reusable (max_steps drives the
    lr/c2f/candidate schedules — see plan_run).
    """
    if not os.path.exists(path):
        return {}
    try:
        prior = json.load(open(path))
    except (json.JSONDecodeError, OSError):
        return {}
    if prior.get("recipe") != recipe_name or prior.get("steps") != steps:
        return {}
    return {
        r["seed"]: r for r in prior.get("runs", [])
        if r.get("steps") == steps and "trace" in r
    }


def write_summary(out: str, recipe_name: str, steps: int, seeds: list,
                  results: list, commit: str) -> dict:
    """Write the protocol artifact. Called after EVERY completed seed (not
    only at the end) so a crash/preemption/session wipe loses at most the
    in-flight seed; a partial artifact carries `"partial": true` and the
    seeds still missing, and is never mistaken for the finished protocol.
    """
    import numpy as np

    finals = np.array([r["final_rel_R_deg"] for r in results])
    finals_t = np.array([r["final_rel_t"] for r in results])
    done = [r["seed"] for r in results]
    summary = {
        "recipe": recipe_name,
        "steps": steps,
        "seeds": seeds,
        "git_commit": commit,
        "final_rel_R_deg": {
            "median": round(float(np.median(finals)), 2),
            "min": round(float(finals.min()), 2),
            "max": round(float(finals.max()), 2),
        },
        "final_rel_t": {
            "median": round(float(np.median(finals_t)), 3),
            "min": round(float(finals_t.min()), 3),
            "max": round(float(finals_t.max()), 3),
        },
        "runs": results,
    }
    missing = [s for s in seeds if s not in done]
    if missing:
        summary["partial"] = True
        summary["seeds_missing"] = missing
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    tmp = out + ".tmp"
    with open(tmp, "w") as f:
        json.dump(summary, f, indent=2)
    os.replace(tmp, out)
    return summary


def plan_run(run_dir: str, steps: int) -> str:
    """Decide how to treat an existing run directory: 'reuse' (complete,
    same schedule), 'resume' (partial with checkpoints, same schedule),
    or 'fresh' (absent, stale-schedule, or partial without checkpoints).

    Only a run trained under the SAME schedule is reusable/resumable: the
    lr decay, c2f annealing, and candidate schedule all key off max_steps,
    so a longer run is NOT a superset of a shorter one.
    """
    mfile = os.path.join(run_dir, "metrics.jsonl")
    if not os.path.exists(mfile):
        return "fresh"
    cfg_file = os.path.join(run_dir, "config.yaml")
    if not os.path.exists(cfg_file):
        return "fresh"
    import yaml

    saved = yaml.safe_load(open(cfg_file))
    if int(saved.get("max_steps", -1)) != steps:
        return "fresh"
    prev = [json.loads(l) for l in open(mfile) if "pose_R_rel" in l]
    if prev and prev[-1]["step"] >= steps:
        return "reuse"
    ckpt_dir = os.path.join(run_dir, "ckpts")
    if os.path.isdir(ckpt_dir) and len(os.listdir(ckpt_dir)) > 0:
        return "resume"
    return "fresh"


def run_one(recipe: dict, recipe_name: str, seed: int, steps: int,
            tag: str, prior: dict = None) -> dict:
    """One training run; returns {seed, init/final rel-R (deg) and rel-t}.

    Idempotent at the seed level (plan_run): a run directory whose metrics
    log already reaches `steps` is summarized without retraining; a partial
    run with checkpoints auto-resumes (the Trainer restores the latest ckpt
    and the metrics sink appends); a partial run WITHOUT checkpoints (e.g.
    killed mid-flight through a relay hang before the first ckpt) is wiped
    so the fresh run's trace is clean. This lets a crashed protocol
    invocation be re-issued verbatim and only redo the missing seeds.
    """
    import shutil

    import numpy as np

    from upnerf.cli.train import main as train_main
    from upnerf.config import default, merge_from_file

    hp = default()
    merge_from_file(hp, recipe["config"])
    scene = recipe["scene_dir"]
    # recipes sharing a scene_dir/out_dir (identity_hires vs its _c2f
    # variant) must never collide on run directories: plan_run keys only
    # on max_steps, so a shared exp name would silently reuse the OTHER
    # recipe's run. Legacy names (no recipe infix) are kept for the
    # original three recipes so their live scratch runs stay reusable.
    infix = ("" if recipe_name in ("pose", "identity", "identity_hires")
             else f"_{recipe_name}")
    exp = f"protocol{infix}{tag}_seed{seed}"
    hp.update(recipe["overrides"])
    hp.update({
        "seed": seed,
        "exp_name": exp,
        "max_steps": steps,
        "root_dir": scene,
        "feat_dir": os.path.join(scene, "DINO"),
        "depth_dir": os.path.join(scene, "DPT"),
        # pose logging is the measurement; keep everything else cheap
        "train.log_pose_interval": max(500, steps // 30),
        "val.log_interval": 10**9,
        # Intermediate ckpts bound the cost of a mid-run crash/hang; the
        # Trainer's auto-resume picks them up on the re-issued command.
        "train.ckpt_interval": min(steps, 50000),
    })

    run_dir = os.path.join(hp["out_dir"], hp["scene_name"], exp)
    mfile = os.path.join(run_dir, "metrics.jsonl")
    plan = plan_run(run_dir, steps)
    print(f"[protocol]   plan for {run_dir}: {plan}")
    if plan == "fresh" and prior is not None:
        # The scratch run is gone (session wipe) but a committed artifact
        # already holds this seed's completed measurement under the same
        # recipe + schedule: reuse it instead of retraining. A live
        # scratch run (reuse/resume) always takes precedence — it carries
        # the ground-truth metrics log.
        print(f"[protocol]   seed {seed}: reusing committed artifact run")
        return dict(prior, reused_from_artifact=True)
    if plan == "fresh" and os.path.isdir(run_dir):
        shutil.rmtree(run_dir)

    if plan != "reuse":
        np.random.seed(seed)
        train_main(hp)

    rows = [json.loads(l) for l in open(mfile) if "pose_R_rel" in l]
    rows = [r for r in rows if r["step"] <= steps]
    assert rows, f"no pose logs in {mfile}"
    # Guard the graceful-preemption path: SIGTERM makes the Trainer
    # checkpoint and RETURN cleanly mid-run; a partial trajectory must
    # never be summarized as final. Raising lets a supervisor re-issue
    # the command, which resumes from the shutdown checkpoint.
    log_int = max(500, steps // 30)
    expect_last = (steps // log_int) * log_int
    if rows[-1]["step"] < expect_last:
        raise RuntimeError(
            f"run {run_dir} stopped at step {rows[-1]['step']} < {steps} "
            "(preempted?); re-issue to resume from its checkpoint"
        )
    first, last = rows[0], rows[-1]
    return {
        "seed": seed,
        "exp": exp,
        "init_rel_R_deg": round(first["train/pose_R_rel"], 2),
        "init_rel_t": round(first["train/pose_t_rel"], 3),
        "final_rel_R_deg": round(last["train/pose_R_rel"], 2),
        "final_rel_t": round(last["train/pose_t_rel"], 3),
        "min_rel_R_deg": round(
            min(r["train/pose_R_rel"] for r in rows), 2
        ),
        "steps": steps,
        # Full descent curve: the run directories under outputs_validation/
        # are scratch, so the evidence for "still descending" / "stalls at
        # its 90k value" style claims lives here.
        "trace": [
            [
                int(r["step"]),
                round(r["train/pose_R_rel"], 2),
                round(r["train/pose_t_rel"], 3),
            ]
            for r in rows
        ],
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--recipe", choices=sorted(RECIPES), required=True)
    ap.add_argument("--seeds", default="42,777,1234")
    ap.add_argument("--steps", type=int, default=None)
    ap.add_argument("--tag", default="")
    args = ap.parse_args()

    recipe = RECIPES[args.recipe]
    seeds = [int(s) for s in args.seeds.split(",")]
    # The protocol proper is >=3 seeds; a --tag'd run may use fewer (e.g. a
    # single-seed schedule-length extension of an existing 3-seed artifact).
    assert len(seeds) >= 3 or args.tag, (
        "protocol requires >=3 seeds (or pass --tag for a study extension)"
    )
    steps = args.steps or recipe["default_steps"]

    if not os.path.isdir(recipe["scene_dir"]):
        from upnerf.data import synthetic

        print(f"[protocol] generating scene {recipe['scene_dir']}")
        synthetic.generate_scene(recipe["scene_dir"], **recipe["scene_kwargs"])

    try:
        import subprocess

        commit = subprocess.run(
            ["git", "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, cwd=os.path.dirname(__file__),
        ).stdout.strip()
    except Exception:
        commit = ""

    out = artifact_path(args.recipe, args.tag)
    prior_runs = load_prior_runs(out, args.recipe, steps)
    if prior_runs:
        print(f"[protocol] prior artifact holds seeds "
              f"{sorted(prior_runs)} at {steps} steps")

    results = []
    for seed in seeds:
        print(f"[protocol] {args.recipe} seed {seed} ({steps} steps)...")
        results.append(
            run_one(recipe, args.recipe, seed, steps, args.tag,
                    prior_runs.get(seed))
        )
        print(f"[protocol]   -> {results[-1]}")
        summary = write_summary(out, args.recipe, steps, seeds, results,
                                commit)
        print(f"[protocol] wrote {out} "
              f"({len(results)}/{len(seeds)} seeds)")

    print(json.dumps(summary["final_rel_R_deg"]))


if __name__ == "__main__":
    main()
