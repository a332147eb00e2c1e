"""GT-free pose-warp (basin-stall) detection and mitigation.

No reference equivalent: the reference trains straight through a stalled
pose basin (the recurring 1-in-N-seeds failure where a contiguous arc of
cameras converges to a locally-consistent but globally-wrong warp —
docs/DESIGN.md "TTO-success benchmark", seed 777: a ~12-deg warp over a
third of the ring, test views inside the arc capped at ~12 dB).

Detection uses the per-image loss accumulation the train step already
returns (``img_loss_sum`` / ``img_loss_cnt`` in the step metrics,
upnerf/train/step.py): a warped image's loss stays a large multiple of the
ring median long after its neighbors converge. The detector keeps an EMA
of each image's loss-to-median ratio and flags images whose EMA exceeds
``ratio`` for ``patience`` consecutive checks inside the
[min_progress, max_progress] training window. GT poses are never used, so
the detector runs on real scenes.

Mitigation (opt-in, ``pose.warp.mitigate: multistart``) is a scored
multi-start on the flagged rows of the pose table: propose a fixed set of
candidate se(3) refinements (current, reset-to-base, Gaussian kicks
around both), score each by the FEATURE alignment loss at reduced PE
progress — the coarse-basin objective UP-NeRF itself uses for pose
descent (models/nerf.py:126-147 anneal; feature loss losses.py:31-32) —
and adopt the argmin. Scoring at full PE sharpness would always prefer
the locally-aligned warped pose (that is what a local minimum means);
the widened coarse-PE basin is what lets a globally-better candidate
win. Adopted rows get their Adam moments zeroed so the optimizer
re-adapts from the new basin.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from upnerf.geometry import rays as ray_utils, se3
from upnerf.render import render_rays

from .step import StepConfig, gather_feats


class WarpConfig(NamedTuple):
    detect: bool = True
    ratio: float = 2.5          # flag when EMA(loss / median loss) exceeds
    patience: int = 3           # ... for this many consecutive checks
    decay: float = 0.7          # EMA decay per check
    min_progress: float = 0.35  # detection window (early spread is normal,
    max_progress: float = 0.9   # late kicks cannot re-converge)
    mitigate: str = "none"      # "none" (log only) | "multistart"
    kicks: int = 8              # random kick candidates per flagged image
    kick_sigma_rot: float = 0.08   # rad, ~4.6 deg
    kick_sigma_t: float = 0.05
    score_progress: float = 0.5    # PE progress for candidate scoring
    score_rays: int = 1024
    max_events: int = 4         # total mitigation events per run
    cooldown: int = 5           # checks skipped after an event

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "WarpConfig":
        g = lambda k, d: hp.get(f"pose.warp.{k}", d)  # noqa: E731
        return cls(
            detect=bool(g("detect", True)),
            ratio=float(g("ratio", 2.5)),
            patience=int(g("patience", 3)),
            decay=float(g("decay", 0.7)),
            min_progress=float(g("min_progress", 0.35)),
            max_progress=float(g("max_progress", 0.9)),
            mitigate=str(g("mitigate", "none")),
            kicks=int(g("kicks", 8)),
            kick_sigma_rot=float(g("kick_sigma_rot", 0.08)),
            kick_sigma_t=float(g("kick_sigma_t", 0.05)),
            score_progress=float(g("score_progress", 0.5)),
            score_rays=int(g("score_rays", 1024)),
            max_events=int(g("max_events", 4)),
            cooldown=int(g("cooldown", 5)),
        )


class WarpDetector:
    """EMA-ratio stall detector over the per-image loss stream.

    ``update`` consumes one check's (sum, count) vectors and returns the
    boolean flag vector (all-False outside the detection window or during
    an event cooldown). Images unsampled in a check (count 0) keep their
    EMA. State is host-side numpy — checks happen at metric log points,
    never inside jit.
    """

    def __init__(self, n_images: int, cfg: WarpConfig):
        self.cfg = cfg
        self.ema = np.ones(n_images, np.float64)
        self.streak = np.zeros(n_images, np.int64)
        self.cooldown = 0
        self.events = 0

    def update(self, img_sum, img_cnt, progress: float) -> np.ndarray:
        cfg = self.cfg
        s = np.asarray(img_sum, np.float64)
        c = np.asarray(img_cnt, np.float64)
        seen = c > 0
        mean = np.where(seen, s / np.maximum(c, 1.0), 0.0)
        med = np.median(mean[seen]) if seen.any() else 0.0
        if med <= 0:
            return np.zeros_like(seen)
        ratio = mean / med
        self.ema = np.where(
            seen, cfg.decay * self.ema + (1.0 - cfg.decay) * ratio, self.ema
        )
        self.streak = np.where(self.ema > cfg.ratio, self.streak + 1, 0)
        if self.cooldown > 0:
            self.cooldown -= 1
            return np.zeros_like(seen)
        if not (cfg.min_progress <= progress <= cfg.max_progress):
            return np.zeros_like(seen)
        return self.streak >= cfg.patience

    def start_cooldown(self):
        self.events += 1
        self.cooldown = self.cfg.cooldown
        self.streak[:] = 0

    @property
    def budget_left(self) -> bool:
        return self.events < self.cfg.max_events


def make_pose_scorer(cfg: StepConfig, n_rays: int, score_progress: float):
    """Jitted candidate scorer for one image.

    score(params, pose-free scene, img_i, px, py, cands) -> (M,) feature
    alignment loss per candidate se(3) refinement, rendered deterministic
    at the widened coarse-PE progress. Requires encode_feat (the feature
    head IS the scoring objective)."""
    assert cfg.render.encode_feat, "pose multistart needs feature encoding"
    rcfg = cfg.render._replace(perturb=0.0)
    typ = "fine" if cfg.loss.fine else "coarse"

    @jax.jit
    def score(params, scene, img_i, px, py, cands):
        B = n_rays
        img_idx = jnp.full((B,), img_i, jnp.int32)
        K = jnp.broadcast_to(scene.Ks[img_i], (B, 3, 3))
        dirs = ray_utils.pixel_directions(px, py, K)
        base = scene.poses[img_i]
        near_far = jnp.broadcast_to(scene.near_far[img_i], (B, 2))
        target = gather_feats(
            scene, {"px": px, "py": py, "img_idx": img_idx}
        )
        render_params = {
            "nerf_coarse": params["nerf_coarse"],
            "nerf_fine": params.get("nerf_fine"),
            "embeddings": params["embeddings"],
        }

        def one(cand):
            pose = se3.compose(
                [se3.se3_to_SE3(cand[None]), base[None]]
            )[0]
            rays_o, rays_d = ray_utils.get_rays(
                dirs, jnp.broadcast_to(pose, (B, 3, 4))
            )
            rays = jnp.concatenate([rays_o, rays_d, near_far], axis=-1)
            out = render_rays(
                render_params, rcfg, cfg.nerf, rays, img_idx,
                key=None, phase=0, sched_mult=jnp.asarray(0.0),
                progress=jnp.asarray(score_progress, jnp.float32), det=True,
            )
            return ((out[f"feat_{typ}"] - target) ** 2).mean()

        return jax.lax.map(one, cands)

    return score


def propose_candidates(
    current: np.ndarray, cfg: WarpConfig, rng: np.random.RandomState
) -> np.ndarray:
    """Candidate se(3) rows for one flagged image: [current, reset-to-base,
    kicks/2 around current, kicks/2 around base]. Candidate 0 is always the
    incumbent, so adoption is monotone in the scoring objective."""
    sig = np.array(
        [cfg.kick_sigma_rot] * 3 + [cfg.kick_sigma_t] * 3, np.float64
    )
    half = max(1, cfg.kicks // 2)
    around_cur = current[None] + rng.randn(half, 6) * sig
    around_base = rng.randn(cfg.kicks - half, 6) * sig
    return np.concatenate(
        [current[None], np.zeros((1, 6)), around_cur, around_base]
    ).astype(np.float32)


def reset_opt_rows(opt_state, rows: np.ndarray, table_shape: Tuple[int, int]):
    """Zero the optimizer-moment rows of the pose-table leaves for the
    adopted images (every leaf whose shape equals the se3 table's), so
    stale Adam momentum/scale from the abandoned basin does not drag the
    fresh candidate straight back."""
    def f(leaf):
        if hasattr(leaf, "shape") and tuple(leaf.shape) == table_shape:
            arr = np.array(leaf)
            arr[rows] = 0
            return jnp.asarray(arr)
        return leaf

    return jax.tree.map(f, opt_state)


def run_multistart(
    scorer,
    params: Dict[str, Any],
    scene,
    se3_table: np.ndarray,
    flags: np.ndarray,
    wh: np.ndarray,
    cfg: WarpConfig,
    rng: np.random.RandomState,
    log=print,
) -> Tuple[np.ndarray, np.ndarray]:
    """Score candidates for every flagged image; returns (new_se3_table,
    adopted_rows). Host loop over flagged images — mitigation events are
    rare, and the per-image scorer compiles once (static B, M)."""
    new_tab = np.array(se3_table)
    adopted = []
    for i in np.nonzero(flags)[0]:
        w, h = float(wh[i][0]), float(wh[i][1])
        px = jnp.asarray(
            np.floor(rng.rand(cfg.score_rays) * w).clip(0, w - 1), jnp.float32
        )
        py = jnp.asarray(
            np.floor(rng.rand(cfg.score_rays) * h).clip(0, h - 1), jnp.float32
        )
        cands = propose_candidates(new_tab[i], cfg, rng)
        scores = np.asarray(
            scorer(params, scene, jnp.asarray(i, jnp.int32), px, py,
                   jnp.asarray(cands))
        )
        best = int(np.argmin(scores))
        log(
            f"[warp] image {i}: candidate scores "
            f"cur={scores[0]:.4f} base={scores[1]:.4f} "
            f"best={scores[best]:.4f} (#{best})"
        )
        if best != 0:
            new_tab[i] = cands[best]
            adopted.append(i)
    return new_tab, np.asarray(adopted, np.int64)
