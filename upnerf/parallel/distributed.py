"""Multi-controller (multi-host) runtime support.

The reference scales with Lightning's DDP strategy over torch.distributed /
NCCL — one process per GPU, gradient allreduce (train.py:70-72). The
TPU-native equivalent is JAX's multi-controller runtime: one process per
HOST, every process running the SAME SPMD program over one global device
mesh; the gradient reduction is the same `psum` the single-host mesh path
already emits, now riding ICI within a slice and DCN across slices. Nothing
in the train step changes — the mesh just gets bigger — so this module is
deliberately thin:

- `initialize(...)`: bring up the distributed runtime. On TPU pods every
  argument is auto-discovered from the TPU metadata; for the CPU smoke
  configuration (tests) the coordinator/process arguments are explicit and
  collectives run over gloo.
- `put_replicated` / `put_local_shards`: place host data into GLOBAL
  arrays. `jax.device_put` only targets addressable devices; in
  multi-controller mode every process owns a subset, so globally-sharded
  arrays must be assembled from per-process local data
  (`jax.make_array_from_process_local_data`). Single-process meshes take
  the plain `device_put` path, so callers use one API everywhere.
- `fetch`: the inverse — bring a (possibly non-addressable) global array
  back to every host as numpy, allgathering when required.

Process-0 gating of filesystem/W&B side effects lives with the callers
(`upnerf.train.loop.Trainer`); orbax checkpointing needs no gating — every
process must call save/restore and the manager coordinates writers itself.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np

__all__ = [
    "initialize",
    "is_multiprocess",
    "is_main_process",
    "put_replicated",
    "put_local_shards",
    "fetch",
    "sync",
]


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids: Optional[Any] = None,
    initialization_timeout: Optional[int] = None,
) -> None:
    """Start the multi-controller runtime (idempotent under re-entry checks
    upstream). On TPU pod slices call it with NO arguments — coordinator,
    process count, and process id are discovered from the TPU metadata. On
    CPU (tests / smoke), pass all three explicitly; collectives are routed
    through gloo, which ships in jaxlib.

    Must run before any other JAX call creates the backend client.
    """
    # Reading jax.default_backend() here would initialize the backend —
    # exactly what must not happen before jax.distributed.initialize — so
    # key the gloo switch off the platform CONFIG only.
    try:
        platforms = jax.config.jax_platforms
    except AttributeError:  # pragma: no cover - very old jax
        platforms = None
    if platforms and "cpu" in str(platforms):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    if initialization_timeout is not None:
        # e.g. CPU smoke clusters on an oversubscribed host, where a peer
        # can take minutes past jax's 300 s default to reach the barrier
        kwargs["initialization_timeout"] = int(initialization_timeout)
    jax.distributed.initialize(**kwargs)
    # Establish the collective context NOW, while every process is at the
    # same point with minimal skew. Gloo's one-time context rendezvous has
    # a hard 30 s key-value timeout, and the natural first collective
    # (e.g. orbax's checkpoint-directory sync) happens only after scene
    # loading + state build + first compiles — on an oversubscribed host
    # the inter-process skew by then can exceed 30 s and fail the context
    # setup ("Gloo context initialization failed: DEADLINE_EXCEEDED").
    sync("upnerf:init")


def is_multiprocess() -> bool:
    return jax.process_count() > 1


def is_main_process() -> bool:
    return jax.process_index() == 0


def _is_multiprocess_sharding(sharding) -> bool:
    return any(
        d.process_index != jax.process_index()
        for d in sharding.device_set
    )


def put_replicated(tree: Any, sharding) -> Any:
    """Place a host pytree fully replicated over `sharding`'s mesh. Every
    process must pass the SAME values (the usual SPMD contract). Works on
    single-process meshes too (plain device_put)."""
    if not _is_multiprocess_sharding(sharding):
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def put_local_shards(tree: Any, sharding) -> Any:
    """Assemble a GLOBAL batch-sharded array from this process's local rows
    (leading axis). Each process passes only its own slice — global row i
    lives on process i // (rows_per_process). Single-process meshes degrade
    to a plain sharded device_put of the full batch."""
    if not _is_multiprocess_sharding(sharding):
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            sharding, np.asarray(x)
        ),
        tree,
    )


def fetch(tree: Any) -> Any:
    """Global arrays -> host numpy on EVERY process. Replicated / fully
    addressable arrays are a local copy; cross-process sharded arrays are
    allgathered (val-render outputs under a global mesh)."""

    def _one(x):
        if (
            not isinstance(x, jax.Array)
            or x.is_fully_addressable
            or x.is_fully_replicated
        ):
            # Replicated arrays must NOT take the allgather path: each
            # process's host-local view is already the full array, and a
            # tiled gather would concatenate the duplicates.
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(_one, tree)


def sync(name: str = "sync") -> None:
    """Cross-process barrier (no-op single-process)."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices(name)
