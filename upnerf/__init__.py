"""up-nerf-tpu: a TPU-native JAX/XLA framework with the capabilities of UP-NeRF.

Pose-prior-free neural radiance fields for unconstrained photo collections
(reference: mlvlab/UP-NeRF, NeurIPS 2023), re-designed TPU-first:

- one jitted train step (pjit/shard_map over a device mesh) instead of a
  Lightning module with Python-level control flow,
- a compact device-resident ray store (pixel coords + u8 RGB; ray directions
  and DINO features are computed/gathered on device inside jit) instead of
  tens-of-GB host pickle buffers,
- static-shape mixture-CDF importance sampling instead of schedule-dependent
  dynamic sample counts,
- batched test-time optimization over all test images in one program.

Subpackages:
  config    flat dotted-key YAML config (reference: configs/config.py)
  geometry  SE(3)/SO(3) Lie ops, pose algebra, Procrustes, rays
  data      COLMAP parser, Phototourism/custom datasets, ray store/cache
  models    NeRF MLP with annealed PE, transient net, embedding tables
  render    stratified + inverse-CDF sampling, volume compositing
  ops       device-side interpolation, Pallas kernels
  parallel  device mesh + sharding helpers
  train     train state, jitted step, schedules, host loop, optimizers
  evaluate  image/pose metrics, test-time optimization, eval protocol
  utils     checkpointing, visualization, logging
  cli       train / tto / eval / prepare_cache entry points
"""

__version__ = "0.1.0"

# Optional platform pin, honored at import so every CLI subprocess can be
# steered from the environment: UPNERF_PLATFORM=cpu runs e.g. eval/tto on
# host CPU while a training job owns the TPU (the serial-chip contract in
# CLAUDE.md), and lets the runbook execute its compute stages on machines
# whose sitecustomize force-registers a remote accelerator backend (where
# plain JAX_PLATFORMS is overridden and therefore unreliable).
import os as _os

_platform = _os.environ.get("UPNERF_PLATFORM")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
del _os
