"""Opt-in FAST serving renders: per-ray interval tightening.

Serving-only sampling acceleration (docs/ROADMAP.md deferred-item follow-up)
in a TPU-friendly, static-shape form. Occupancy grids / learned samplers
change per-ray sample COUNTS (dynamic shapes — XLA-hostile) and would skew
the training distribution; instead, a cheap sigma-only probe of the coarse
network tightens each ray's [near, far] integration interval to where the
transmittance-weighted mass actually lives, and the standard coarse+fine
render then spends a SMALLER fixed sample budget inside it. Rays carry
per-ray near/far natively ((R, 8) layout), so the tightened interval drops
straight into the unchanged render path — including the fused Pallas
kernels.

Training, validation, and TTO are NOT touched (parity surfaces); this is
for the free-pose serving paths (render_video, make_pose_renderer). The
probe uses the coarse network's density, the same signal the reference
trusts to place its importance samples (models/rendering.py:262-307).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Tuple

import jax.numpy as jnp

from upnerf.models.nerf import NeRFConfig, apply_nerf

from . import volume
from .render_rays import RenderConfig


class FastRenderConfig(NamedTuple):
    """Probe configuration for interval tightening.

    Defaults are the measured-lossless point on a trained synthetic scene
    (scripts/bench_fast_render.py sweep, docs/DESIGN.md "Fast serving
    renders"): at full budget, tightening with these thresholds changed
    PSNR by +0.01 dB; aggressive clipping (eps 1e-3, probe 32) cost
    ~0.5 dB. Tighten conservatively — the speed comes from the reduced
    budget, not from clipping mass."""

    n_probe: int = 64       # sigma-only probe samples per ray
    eps: float = 1e-5       # weight-CDF mass clipped off each end
    pad: int = 3            # extra probe bins kept beyond the clip points
    min_mass: float = 1e-2  # rays with less total probe mass keep [near,far]
    # Reduced render budget used inside the tightened interval (the whole
    # point of the probe): None keeps the caller's RenderConfig counts.
    N_samples: int = 64
    N_importance: int = 64


def tighten_from_weights(
    z_vals: jnp.ndarray,       # (R, P) probe depths
    weights: jnp.ndarray,      # (R, P) composite weights of the probe
    near: jnp.ndarray,         # (R, 1)
    far: jnp.ndarray,          # (R, 1)
    eps: float,
    pad: int,
    min_mass: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure interval-tightening: smallest [z_lo, z_hi] containing the
    central (1 - 2*eps) fraction of the probe's weight mass, padded by
    `pad` probe bins; rays with negligible total mass (sky / empty) fall
    back to the full [near, far]."""
    P = z_vals.shape[1]
    total = weights.sum(-1, keepdims=True)  # (R, 1)
    cdf = jnp.cumsum(weights, axis=-1) / jnp.maximum(total, 1e-12)
    lo_i = jnp.argmax(cdf > eps, axis=-1)  # first bin past the left clip
    # Right clip: first bin at >= 1-eps of the mass. Rounding can leave the
    # final cdf entry just below 1-eps (certainly at eps=0); argmax of an
    # all-False mask is 0, which would collapse the interval to the front —
    # fall back to the last bin instead.
    hi_mask = cdf >= 1.0 - eps
    hi_i = jnp.where(hi_mask.any(-1), jnp.argmax(hi_mask, axis=-1), P - 1)
    lo_i = jnp.maximum(lo_i - pad, 0)
    hi_i = jnp.minimum(hi_i + pad, P - 1)
    z_lo = jnp.take_along_axis(z_vals, lo_i[:, None], axis=-1)
    z_hi = jnp.take_along_axis(z_vals, hi_i[:, None], axis=-1)
    keep_full = total <= min_mass
    z_lo = jnp.where(keep_full, near, jnp.maximum(z_lo, near))
    z_hi = jnp.where(keep_full, far, jnp.minimum(z_hi, far))
    # Non-degenerate interval INSIDE [near, far]: widening z_hi before the
    # far clamp would let the clamp collapse it back to zero width when
    # all probe mass sits in the last bin (pad=0), so enforce the minimum
    # width by lowering z_lo after clamping instead.
    z_lo = jnp.minimum(z_lo, z_hi - 1e-4)
    return z_lo, z_hi


def tighten_rays(
    coarse_params: Dict[str, Any],
    nerf_cfg: NeRFConfig,
    rcfg: RenderConfig,
    fast: FastRenderConfig,
    rays: jnp.ndarray,  # (R, 8)
    progress: jnp.ndarray,
) -> jnp.ndarray:
    """Sigma-only probe of the coarse network -> rays with tightened
    per-ray near/far (same (R, 8) layout)."""
    rays_o, rays_d = rays[:, 0:3], rays[:, 3:6]
    near, far = rays[:, 6:7], rays[:, 7:8]
    # Deterministic uniform probe (the det eval path of stratified
    # sampling, models/rendering.py:25-27), linear in depth.
    t = jnp.linspace(0.0, 1.0, fast.n_probe)
    z = near * (1.0 - t) + far * t  # (R, P)
    xyz = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    out = apply_nerf(
        coarse_params,
        nerf_cfg,
        {"input_xyz": xyz, "input_dir": rays_d},
        phase=2,
        sched_mult=jnp.asarray(1.0),
        progress=progress,
        encode_candidate=False,
        sigma_only=True,
        precision=rcfg.precision,
    )
    deltas = volume.deltas_from_z(z)
    alphas = volume.alpha_from_sigma(out["s_sigma"], deltas)
    weights = volume.composite_weights(alphas)
    z_lo, z_hi = tighten_from_weights(
        z, weights, near, far, fast.eps, fast.pad, fast.min_mass
    )
    return jnp.concatenate([rays_o, rays_d, z_lo, z_hi], axis=-1)


def fast_render_config(rcfg: RenderConfig, fast: FastRenderConfig):
    """The reduced-budget RenderConfig used inside tightened intervals."""
    return rcfg._replace(
        N_samples=fast.N_samples or rcfg.N_samples,
        N_importance=fast.N_importance or rcfg.N_importance,
    )
