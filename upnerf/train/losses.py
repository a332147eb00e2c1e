"""UP-NeRF phase-scheduled loss (losses.py:5-64).

Terms (all means over the ray batch):
  phase < 2 (sched_mult < 1):
    l_depth_{c,f}: L1(s_depth, depth_prior) * (1 - t_weight).detach()
                   * depth_mult * (1 - sched)         (losses.py:25-28,45-49)
    l_feat_{c,f} : L2(feat, dino_feat) * (1 - sched)  (losses.py:31-32,51-53)
  phase > 0 (sched_mult > 0):
    l_rgb_c : L2(s_rgb_coarse, rgb) * sched / 2       (losses.py:38-39)
    l_rgb_f : L2(s_rgb_fine, rgb) / (2 beta^2) * sched (losses.py:58-61)
    l_beta  : log(beta).mean() * sched                (losses.py:62)
    l_alpha : t_alpha.mean() * alpha_reg * sched      (losses.py:63)

NOTE: the RGB losses use the *raw static* s_rgb_{coarse,fine}, NOT the
transient-composited rgb_* maps — in the reference the composited maps are
only logged/PSNR'd (models/nerf_system.py:136-144 creates new keys;
losses.py:38,59 read the s_rgb keys). The transient net therefore trains
only through beta (loss attenuation) and the alpha regularizer; its rgb head
receives no gradient. Replicated faithfully.

The phase gates are static (compiled per phase); sched_mult is traced.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp


class LossConfig(NamedTuple):
    depth_mult: float = 1e-3
    alpha_reg: float = 1.0
    encode_feat: bool = True
    fine: bool = True
    # OPT-IN (default 0 = exact reference loss): variance penalty on the
    # per-image log depth scales. The identity-init study found the
    # residual pose error is an arc contraction that per-image scale/shift
    # freedom cannot pin (docs/DESIGN.md "Identity-init pose recovery");
    # tying the scales together anchors the global scale gauge.
    depth_scale_reg: float = 0.0

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "LossConfig":
        return cls(
            depth_mult=hp["loss.depth_mult"],
            alpha_reg=hp["loss.alpha_reg"],
            encode_feat=hp["nerf.feat_dim"] > 0,
            fine=hp["nerf.N_importance"] > 0,
            depth_scale_reg=hp.get("loss.depth_scale_reg", 0.0),
        )


def compute_loss(
    cfg: LossConfig,
    results: Dict[str, jnp.ndarray],
    rgb_targets: jnp.ndarray,  # (R, 3)
    feat_targets: jnp.ndarray,  # (R, feat_dim)
    depth_targets: jnp.ndarray,  # (R,)
    sched_mult: jnp.ndarray,
    phase: int,
) -> Dict[str, jnp.ndarray]:
    """Per-term loss dict (sum it for the total), mirroring losses.py:21-64."""
    ret: Dict[str, jnp.ndarray] = {}

    def depth_term(typ: str) -> jnp.ndarray:
        l = jnp.abs(results[f"s_depth_{typ}"] - depth_targets)
        tw = results.get(f"t_weight_{typ}")
        if tw is not None:
            l = l * (1.0 - jax.lax.stop_gradient(tw))
        return l.mean() * cfg.depth_mult * (1.0 - sched_mult)

    if phase < 2:
        ret["l_depth_c"] = depth_term("coarse")
        if cfg.encode_feat:
            ret["l_feat_c"] = (
                (results["feat_coarse"] - feat_targets) ** 2
            ).mean() * (1.0 - sched_mult)
        else:
            ret["l_c_rgb_c"] = (
                (results["c_rgb_coarse"] - rgb_targets) ** 2
            ).mean() * (1.0 - sched_mult)

    if phase > 0:
        ret["l_rgb_c"] = (
            (results["s_rgb_coarse"] - rgb_targets) ** 2
        ).mean() * sched_mult / 2.0

    if not cfg.fine:
        return ret

    if phase < 2:
        ret["l_depth_f"] = depth_term("fine")
        if cfg.encode_feat:
            ret["l_feat_f"] = (
                (results["feat_fine"] - feat_targets) ** 2
            ).mean() * (1.0 - sched_mult)
        else:
            ret["l_c_rgb_f"] = (
                (results["c_rgb_fine"] - rgb_targets) ** 2
            ).mean() * (1.0 - sched_mult)

    if phase > 0:
        beta = results["t_beta"]
        l_rgb_f = ((results["s_rgb_fine"] - rgb_targets) ** 2) / (
            2.0 * beta[..., None] ** 2
        )
        ret["l_rgb_f"] = l_rgb_f.mean() * sched_mult
        ret["l_beta"] = jnp.log(beta).mean() * sched_mult
        ret["l_alpha"] = results["t_alpha"].mean() * cfg.alpha_reg * sched_mult
    return ret
