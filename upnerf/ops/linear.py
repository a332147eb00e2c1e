"""Dense layer primitive with TPU matmul-precision control.

All framework matmuls go through `dense` so the MXU precision policy is set
in exactly one place:

- 'bfloat16': operands cast to bf16, fp32 accumulation — 1 MXU pass, fastest.
- 'high'    : bf16x3 passes (lax.Precision.HIGH) — near-fp32 accuracy at
              ~3x the bf16 cost; the default for UP-NeRF training, where the
              annealed PE bands and the joint pose optimization are
              precision-sensitive.
- 'float32' : full fp32 (lax.Precision.HIGHEST).

Initialization matches torch.nn.Linear (reference models are torch Linear
stacks, models/nerf.py:38-78): W, b ~ U(-1/sqrt(fan_in), 1/sqrt(fan_in)).
Weights are stored (fan_in, fan_out) so activations hit the MXU as plain
row-major matmuls.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

_PRECISION = {
    "high": jax.lax.Precision.HIGH,
    "float32": jax.lax.Precision.HIGHEST,
    "default": jax.lax.Precision.DEFAULT,
}


def init_linear(key: jax.Array, fan_in: int, fan_out: int) -> Dict[str, jnp.ndarray]:
    bound = 1.0 / (fan_in**0.5)
    kw, kb = jax.random.split(key)
    return {
        "w": jax.random.uniform(kw, (fan_in, fan_out), jnp.float32, -bound, bound),
        "b": jax.random.uniform(kb, (fan_out,), jnp.float32, -bound, bound),
    }


def dense(x: jnp.ndarray, p: Dict[str, jnp.ndarray], precision: str = "high"):
    w, b = p["w"], p["b"]
    if precision == "bfloat16":
        y = jnp.dot(
            x.astype(jnp.bfloat16),
            w.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.dot(x, w, precision=_PRECISION[precision])
    return y + b
