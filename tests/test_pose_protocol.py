"""Unit tests for the pose-protocol runner's seed-level idempotence.

scripts/pose_protocol.py re-issues cleanly after a crash or relay hang:
completed runs are reused, partial runs with checkpoints resume, anything
else (including a run trained under a DIFFERENT schedule — max_steps
drives the lr/c2f/candidate schedules, so a longer run is never a superset
of a shorter one) starts fresh. plan_run is the pure decision function.
"""

import importlib.util
import json
import os

import pytest

_SPEC = importlib.util.spec_from_file_location(
    "pose_protocol",
    os.path.join(os.path.dirname(__file__), "..", "scripts",
                 "pose_protocol.py"),
)
pose_protocol = importlib.util.module_from_spec(_SPEC)
_SPEC.loader.exec_module(pose_protocol)


def _make_run(tmp_path, max_steps, logged_steps, ckpts=()):
    run = tmp_path / f"run_{max_steps}_{len(logged_steps)}_{len(ckpts)}"
    run.mkdir()
    with open(run / "config.yaml", "w") as f:
        f.write(f"max_steps: {max_steps}\n")
    with open(run / "metrics.jsonl", "w") as f:
        for s in logged_steps:
            f.write(json.dumps({
                "step": s, "train/pose_R_rel": 1.0, "train/pose_t_rel": 0.1,
            }) + "\n")
    if ckpts:
        (run / "ckpts").mkdir()
        for c in ckpts:
            (run / "ckpts" / str(c)).mkdir()
    return str(run)


def test_absent_dir_is_fresh(tmp_path):
    assert pose_protocol.plan_run(str(tmp_path / "nope"), 100) == "fresh"


def test_completed_same_schedule_is_reused(tmp_path):
    run = _make_run(tmp_path, 150000, [5000, 150000], ckpts=[150000])
    assert pose_protocol.plan_run(run, 150000) == "reuse"


def test_partial_with_ckpt_resumes(tmp_path):
    run = _make_run(tmp_path, 150000, [5000, 100000], ckpts=[50000, 100000])
    assert pose_protocol.plan_run(run, 150000) == "resume"


def test_partial_without_ckpt_is_fresh(tmp_path):
    # The relay-hang case: killed mid-flight before any checkpoint landed.
    run = _make_run(tmp_path, 150000, [5000, 125000])
    assert pose_protocol.plan_run(run, 150000) == "fresh"


def test_longer_schedule_is_never_a_superset(tmp_path):
    # A completed 150k-schedule run must NOT satisfy a 90k request even
    # though its log passes step 90000.
    run = _make_run(tmp_path, 150000, [5000, 90000, 150000], ckpts=[150000])
    assert pose_protocol.plan_run(run, 90000) == "fresh"


def test_missing_config_is_fresh(tmp_path):
    run = _make_run(tmp_path, 60000, [60000], ckpts=[60000])
    os.remove(os.path.join(run, "config.yaml"))
    assert pose_protocol.plan_run(run, 60000) == "fresh"


def _run_result(seed, steps, final=5.0):
    return {
        "seed": seed, "exp": f"protocol_seed{seed}",
        "init_rel_R_deg": 29.1, "init_rel_t": 1.0,
        "final_rel_R_deg": final, "final_rel_t": 0.1,
        "min_rel_R_deg": final, "steps": steps,
        "trace": [[steps, final, 0.1]],
    }


def test_write_summary_marks_partial_then_complete(tmp_path):
    # Incremental writes: after seed 1 of 2 the artifact is flagged
    # partial with the missing seeds listed; after the last seed the
    # flag disappears. A crash loses at most the in-flight seed.
    out = str(tmp_path / "pose_protocol_identity.json")
    s1 = pose_protocol.write_summary(
        out, "identity", 60000, [42, 777], [_run_result(42, 60000)], "abc")
    assert s1["partial"] is True and s1["seeds_missing"] == [777]
    assert json.load(open(out))["partial"] is True
    s2 = pose_protocol.write_summary(
        out, "identity", 60000, [42, 777],
        [_run_result(42, 60000), _run_result(777, 60000, 7.0)], "abc")
    assert "partial" not in s2 and "seeds_missing" not in s2
    assert json.load(open(out))["final_rel_R_deg"]["median"] == 6.0


def test_load_prior_runs_matches_recipe_and_schedule(tmp_path):
    out = str(tmp_path / "pose_protocol_identity.json")
    pose_protocol.write_summary(
        out, "identity", 60000, [42, 777], [_run_result(42, 60000)], "abc")
    # Same recipe + schedule: the completed seed is reusable.
    prior = pose_protocol.load_prior_runs(out, "identity", 60000)
    assert set(prior) == {42} and prior[42]["final_rel_R_deg"] == 5.0
    # A different schedule is never a superset (max_steps drives the
    # lr/c2f/candidate schedules) — and a different recipe never matches.
    assert pose_protocol.load_prior_runs(out, "identity", 90000) == {}
    assert pose_protocol.load_prior_runs(out, "identity_hires", 60000) == {}
    assert pose_protocol.load_prior_runs(
        str(tmp_path / "absent.json"), "identity", 60000) == {}


def test_run_one_reuses_artifact_when_scratch_is_gone(tmp_path, monkeypatch):
    # Session wipe: no scratch run dir, but the committed artifact holds
    # this seed. run_one must return it without training.
    monkeypatch.chdir(tmp_path)
    recipe = {
        "config": os.path.join(
            os.path.dirname(pose_protocol.__file__), "..",
            "configs", "validation", "synth_identity.yaml"),
        "scene_dir": "outputs_validation/scene_identity",
        "scene_kwargs": {},
        "overrides": {},
        "default_steps": 60000,
    }
    got = pose_protocol.run_one(
        recipe, "identity", 42, 60000, "", prior=_run_result(42, 60000))
    assert got["reused_from_artifact"] is True
    assert got["final_rel_R_deg"] == 5.0


def test_recipes_are_well_formed():
    for name, r in pose_protocol.RECIPES.items():
        assert os.path.exists(r["config"]), name
        assert r["default_steps"] > 0
        assert "scene_kwargs" in r and "overrides" in r
