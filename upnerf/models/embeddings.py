"""Per-image embedding tables.

The reference keeps five per-image trainable tables (appearance 48-d
coarse+fine, candidate 16-d coarse+fine, transient 128-d, plus se3 6-d and
depth-scale 2-d; models/nerf_system.py:345-409, models/transient_net.py:10).
Here a table is just a (N_images, dim) array in the parameter pytree,
gathered by ray image index inside the jitted step — tables are tiny, so
they stay replicated across the mesh and their gradients ride the same psum
as the MLP gradients (SURVEY.md §5 "distributed communication backend").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def init_embedding(
    key: jax.Array, n: int, dim: int, zeros: bool = False
) -> jnp.ndarray:
    """N(0,1) init like torch.nn.Embedding; zeros for se3/depth-scale tables
    (models/nerf_system.py:406-409)."""
    if zeros:
        return jnp.zeros((n, dim), jnp.float32)
    return jax.random.normal(key, (n, dim), jnp.float32)
