"""Orbax checkpointing of the train state.

Replaces Lightning's ModelCheckpoint (train.py:43-49): keeps `last` plus the
top-k by val PSNR, and supports auto-resume (train.py:34-40). The whole
TrainState pytree (params, pose tables, BOTH optimizer states, step) is one
atomic checkpoint; `step` reproduces the schedule `progress`, which the
reference persists as an nn.Parameter (models/nerf.py:36).

`extract_submodel` mirrors the reference's prefix-based surgical loading for
TTO (utils/__init__.py:4-26): pull one sub-tree (e.g. "params/nerf_fine")
out of a checkpointed state.
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


class CheckpointManager:
    """Retention = {latest step} ∪ {top-`max_to_keep` steps by val_psnr}.

    Retention is enforced EXPLICITLY after each save rather than through
    orbax's best_fn/max_to_keep options: those keep only the top-k by
    metric, so a final/preemption checkpoint whose val PSNR is below the
    top-k is deleted the moment it lands — auto-resume then silently
    restarts from an older step, and TTO/eval (`--ckpt last`) read a stale
    model (observed: a 15k-step run whose last surviving checkpoint was
    9k). Per-step metrics live in a plain JSON journal next to the
    checkpoints so `best_step` works across manager instances; steps saved
    without metrics (interval/preemption saves) are protected while
    latest, then reaped."""

    def __init__(self, directory: str, max_to_keep: int = 2):
        self.directory = os.path.abspath(directory)
        self.max_to_keep = max_to_keep
        os.makedirs(self.directory, exist_ok=True)
        self._metrics_path = os.path.join(self.directory, "ckpt_metrics.json")
        self._metrics = {}
        if os.path.isfile(self._metrics_path):
            try:
                with open(self._metrics_path) as f:
                    self._metrics = {int(k): v for k, v in json.load(f).items()}
            except (json.JSONDecodeError, OSError, ValueError):
                self._metrics = {}
        self._mngr = ocp.CheckpointManager(self.directory)

    def save(self, step: int, state: Any, metrics: Optional[dict] = None) -> None:
        self._mngr.save(step, args=ocp.args.StandardSave(state))
        self._mngr.wait_until_finished()
        if metrics:
            self._metrics[int(step)] = {
                k: float(v) for k, v in metrics.items()
            }
            if jax.process_index() == 0:
                tmp = self._metrics_path + ".tmp"
                with open(tmp, "w") as f:
                    json.dump({str(k): v for k, v in self._metrics.items()}, f)
                os.replace(tmp, self._metrics_path)
        self._sweep()

    def _scored(self, steps):
        return sorted(
            ((self._metrics[s].get("val_psnr", -1.0), s)
             for s in steps if s in self._metrics),
            reverse=True,
        )

    def _sweep(self) -> None:
        steps = sorted(self._mngr.all_steps())
        if not steps:
            return
        keep = {steps[-1]}
        keep.update(s for _, s in self._scored(steps)[: self.max_to_keep])
        for s in steps:
            if s not in keep:
                self._mngr.delete(s)

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def best_step(self) -> Optional[int]:
        scored = self._scored(self._mngr.all_steps() or [])
        return scored[0][1] if scored else self._mngr.latest_step()

    def restore(self, state_like: Any, step: Optional[int] = None) -> Any:
        """Restore into the structure of `state_like` (an abstract or
        concrete state pytree). Fields added to the state after a checkpoint
        was written (e.g. `rng`) fall back to their `state_like` values via
        a partial restore."""
        if step is None:
            step = self.latest_step()
        assert step is not None, f"no checkpoint in {self.directory}"
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, state_like)
        try:
            return self._mngr.restore(step, args=ocp.args.StandardRestore(target))
        except ValueError:
            # Checkpoint predates the `rng` state field: a None field is an
            # empty subtree, so the target then matches the old structure.
            if hasattr(target, "_fields") and hasattr(target, "rng"):
                old_target = {
                    f: getattr(target, f) for f in target._fields if f != "rng"
                }
                restored = self._mngr.restore(
                    step, args=ocp.args.StandardRestore(old_target)
                )
                return type(state_like)(
                    rng=getattr(state_like, "rng", None), **restored
                )
            raise

    def restore_raw(self, step: Optional[int] = None) -> Any:
        """Restore WITHOUT a target: returns the saved pytree as plain
        NUMPY arrays (state fields as a dict). Lets consumers read a
        checkpoint when the model/scene context needed to build a target
        state isn't available (e.g. the reverse checkpoint exporter).

        Forces numpy restore per leaf instead of replaying the SAVED
        shardings — a target-free StandardRestore resolves the sharding
        file's devices, which fails off the training topology (e.g.
        exporting a TPU-trained run on a CPU-only host)."""
        import numpy as np

        if step is None:
            step = self.latest_step()
        assert step is not None, f"no checkpoint in {self.directory}"
        item_dir = os.path.join(self.directory, str(step), "default")
        ckptr = ocp.Checkpointer(ocp.PyTreeCheckpointHandler())
        meta = ckptr.metadata(item_dir)
        tree = meta.item_metadata.tree if hasattr(meta, "item_metadata") else meta
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=np.ndarray),
            tree,
            is_leaf=lambda x: hasattr(x, "shape"),
        )
        return ckptr.restore(
            item_dir, args=ocp.args.PyTreeRestore(restore_args=restore_args)
        )

    def close(self):
        self._mngr.close()


def extract_submodel(state: Any, path: str) -> Any:
    """Fetch a sub-pytree by '/'-joined keys, e.g. 'params/nerf_fine'
    (reference: utils/__init__.py:4-26 prefix extraction)."""
    node = state
    for key in path.split("/"):
        if isinstance(node, dict):
            node = node[key]
        else:
            node = getattr(node, key)
    return node


def save_single(path: str, tree: Any) -> None:
    """One-shot whole-pytree save (no manager bookkeeping)."""
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), tree)
    ckptr.wait_until_finished()


def restore_single(path: str, tree_like: Any) -> Any:
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(ocp.utils.to_shape_dtype_struct, tree_like)
    return ckptr.restore(os.path.abspath(path), target)
