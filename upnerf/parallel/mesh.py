"""Device mesh + sharding helpers.

UP-NeRF's only shardable axis is the ray batch (the model is a ~2 M-param
MLP; embeddings are tiny) — SURVEY.md §2/§5. The TPU-native replacement for
the reference's Lightning DDP/NCCL (train.py:70-72) is a 1-D "data" mesh:
rays are sharded across devices, parameters/embeddings are replicated, and
XLA inserts the gradient psum automatically from the sharding annotations of
the jitted train step. Scales to multi-host slices unchanged (the mesh just
gets bigger; collectives ride ICI).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int = 0, devices: Optional[list] = None) -> Mesh:
    """1-D data mesh over local devices (0 = all)."""
    if devices is None:
        devices = jax.devices()
    if n_devices and n_devices > 0:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (ray) axis across the mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Place a host batch pytree with the ray axis sharded."""
    s = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, s), batch)
