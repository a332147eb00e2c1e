"""UP-NeRF MLP with BARF-annealed positional encoding.

Functional re-design of the reference NeRF module (models/nerf.py:5-147):
parameters are a plain pytree (dict of jnp arrays), the forward pass is a
pure function, and the three schedule phases of the candidate head are
*static* arguments so each phase compiles to a dead-code-free XLA program
(the reference switches graphs with Python `if sched_mult < 1` at every call,
models/nerf.py:96-123 — under jit that must be a static specialization;
phase changes exactly twice per training run so recompiles are negligible).

Architecture (models/nerf.py:38-78):
  trunk   : D=8 layers of W=256 + ReLU, skip concat of the PE input at
            layer 4; final Linear(W, W) "xyz_encoding_final".
  shared  : sigma = Softplus(Linear(W, 1));
            feat  = Linear(W, feat_dim=384) [when encode_feat];
            rgb   = Sigmoid(MLP(feat ⊕ PE(dir) ⊕ appearance, W/2)).
  candidate: enc = 2x(Linear -> ReLU) on (xyz_final ⊕ candidate_emb);
            sigma_c = Softplus(Linear); feat_c/rgb_c = Linear.

Initialization matches torch.nn.Linear defaults (U(-1/sqrt(fan_in),
1/sqrt(fan_in)) for both weight and bias) so optimization dynamics track the
reference.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from upnerf.ops.linear import dense, init_linear


class NeRFConfig(NamedTuple):
    """Static NeRF hyperparameters (hashable; safe as a jit static arg)."""

    D: int = 8
    W: int = 256
    skips: Tuple[int, ...] = (4,)
    encode_feat: bool = True
    feat_dim: int = 384
    xyz_L: int = 10
    dir_L: int = 4
    appearance_dim: int = 48
    candidate_dim: int = 16
    c2f: Optional[Tuple[float, float]] = (0.1, 0.5)
    # Run the trunk through the fused Pallas VMEM kernel
    # (upnerf.ops.pallas_mlp; ~2.8x faster than the XLA layer chain on TPU,
    # full-f32 accuracy). Auto-enabled on TPU backends by from_hparams.
    fused_trunk: bool = False

    @property
    def in_channels_xyz(self) -> int:
        return 6 * self.xyz_L + 3

    @property
    def in_channels_dir(self) -> int:
        return 6 * self.dir_L + 3

    @property
    def encode_appearance(self) -> bool:
        return self.appearance_dim > 0

    @property
    def encode_candidate(self) -> bool:
        return self.candidate_dim > 0

    @classmethod
    def from_hparams(cls, hp: Dict[str, Any]) -> "NeRFConfig":
        c2f = hp.get("pose.c2f")
        fused = hp.get("tpu.fused_trunk")
        if fused is None:
            import jax

            fused = jax.default_backend() == "tpu"
        return cls(
            fused_trunk=bool(fused),
            D=hp.get("nerf.D", 8),
            W=hp.get("nerf.W", 256),
            skips=tuple(hp.get("nerf.skips", (4,))),
            encode_feat=hp["nerf.feat_dim"] > 0,
            feat_dim=hp["nerf.feat_dim"],
            xyz_L=hp["nerf.N_emb_xyz"],
            dir_L=hp["nerf.N_emb_dir"],
            appearance_dim=hp["nerf.appearance_dim"],
            candidate_dim=hp["nerf.candidate_dim"],
            c2f=tuple(c2f) if c2f is not None else None,
        )


def init_nerf(key: jax.Array, cfg: NeRFConfig) -> Dict[str, Any]:
    """Initialize the NeRF parameter pytree (models/nerf.py:38-78)."""
    keys = iter(jax.random.split(key, 32))
    p: Dict[str, Any] = {}

    trunk = []
    for i in range(cfg.D):
        if i == 0:
            fan_in = cfg.in_channels_xyz
        elif i in cfg.skips:
            fan_in = cfg.W + cfg.in_channels_xyz
        else:
            fan_in = cfg.W
        trunk.append(init_linear(next(keys), fan_in, cfg.W))
    p["trunk"] = trunk
    p["xyz_final"] = init_linear(next(keys), cfg.W, cfg.W)
    p["share_sigma"] = init_linear(next(keys), cfg.W, 1)

    if cfg.encode_feat:
        p["feat_share"] = init_linear(next(keys), cfg.W, cfg.feat_dim)
        rgb_in = cfg.feat_dim + cfg.in_channels_dir
    else:
        rgb_in = cfg.W + cfg.in_channels_dir
    if cfg.encode_appearance:
        rgb_in += cfg.appearance_dim
    p["rgb_share"] = [
        init_linear(next(keys), rgb_in, cfg.W // 2),
        init_linear(next(keys), cfg.W // 2, 3),
    ]

    if cfg.encode_candidate:
        p["cand_enc"] = [
            init_linear(next(keys), cfg.W + cfg.candidate_dim, cfg.W // 2),
            init_linear(next(keys), cfg.W // 2, cfg.W // 2),
        ]
        p["cand_sigma"] = init_linear(next(keys), cfg.W // 2, 1)
        if cfg.encode_feat:
            p["cand_feat"] = init_linear(next(keys), cfg.W // 2, cfg.feat_dim)
        else:
            p["cand_rgb"] = init_linear(next(keys), cfg.W // 2, 3)
    return p


def pe_weight(progress: jnp.ndarray, L: int, c2f: Tuple[float, float]) -> jnp.ndarray:
    """BARF coarse-to-fine frequency-band weights, (L,) (models/nerf.py:137-145).

    weight_k = (1 - cos(pi * clamp(alpha - k, 0, 1))) / 2 with
    alpha = (progress - start) / (end - start) * L. `progress` is treated as
    data (no gradient), matching `self.progress.data` in the reference.
    """
    start, end = c2f
    progress = jax.lax.stop_gradient(progress)
    alpha = (progress - start) / (end - start) * L
    k = jnp.arange(L, dtype=jnp.float32)
    return (1 - jnp.cos(jnp.clip(alpha - k, 0.0, 1.0) * jnp.pi)) / 2


def positional_encoding(
    x: jnp.ndarray, L: int, weight: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Sin/cos PE with optional per-band annealing weights
    (models/nerf.py:126-147).

    Layout matches torch: per coordinate the 2L block is
    [sin(f0 x) .. sin(f_{L-1} x), cos(f0 x) .. cos(f_{L-1} x)], prefixed by
    the raw coordinates: output dim = N + 2*N*L for input dim N.
    """
    shape = x.shape
    freq = 2.0 ** jnp.arange(L, dtype=jnp.float32) * jnp.pi  # (L,)
    spectrum = x[..., None] * freq  # [..., N, L]
    sin, cos = jnp.sin(spectrum), jnp.cos(spectrum)
    if weight is not None:
        sin = sin * weight
        cos = cos * weight
    enc = jnp.stack([sin, cos], axis=-2)  # [..., N, 2, L]
    enc = enc.reshape(*shape[:-1], shape[-1] * 2 * L)
    return jnp.concatenate([x, enc], axis=-1)


def _split_dense(x_sample, ray_parts, p, dx, precision):
    """relu/linear input of concat(x_sample, *ray_parts) @ W + b with W
    split at row dx. The per-ray conditioning inputs (dir, appearance,
    candidate) may be per-SAMPLE (general path, used by parity tests) or
    per-RAY (rank-1 lower); per-ray contributions are evaluated on R rows
    and broadcast over the sample axis — removing the (R, S, 459) concat
    copies and shrinking two of the three head matmuls by a factor of S
    (measured ~12 ms/step on the flagship config)."""
    w, b = p["w"], p["b"]
    y = dense(x_sample, {"w": w[:dx], "b": b}, precision)
    off = dx
    ray_term = None
    for part in ray_parts:
        d = part.shape[-1]
        t = dense(part, {"w": w[off : off + d], "b": jnp.zeros_like(b)}, precision)
        ray_term = t if ray_term is None else ray_term + t
        off += d
    return y + ray_term[..., None, :]


def _rgb_head_on(base, params, cfg, inputs, progress, precision):
    """Shared/static RGB head (models/nerf.py:101-109): base is s_feat (or
    xyz_final when encode_feat is off)."""
    per_ray = inputs["input_dir"].ndim == inputs["input_xyz"].ndim - 1
    w_dir = pe_weight(progress, cfg.dir_L, cfg.c2f) if cfg.c2f is not None else None
    input_dir = positional_encoding(inputs["input_dir"], cfg.dir_L, w_dir)
    ray_parts = [input_dir]
    if cfg.encode_appearance:
        ray_parts.append(inputs["input_a"])
    if per_ray:
        h = jax.nn.relu(
            _split_dense(
                base, ray_parts, params["rgb_share"][0], base.shape[-1], precision
            )
        )
    else:
        h = jax.nn.relu(
            dense(
                jnp.concatenate([base] + ray_parts, -1),
                params["rgb_share"][0],
                precision,
            )
        )
    return jax.nn.sigmoid(dense(h, params["rgb_share"][1], precision))


def apply_nerf(
    params: Dict[str, Any],
    cfg: NeRFConfig,
    inputs: Dict[str, jnp.ndarray],
    *,
    phase: int,
    sched_mult: jnp.ndarray,
    progress: jnp.ndarray,
    encode_candidate: bool = True,
    sigma_only: bool = False,
    precision: str = "high",
) -> Dict[str, jnp.ndarray]:
    """Forward pass (models/nerf.py:80-124).

    inputs: dict with
      input_xyz (B, 3), input_dir (B, 3) and, as configured,
      input_a (B, appearance_dim), input_c (B, candidate_dim).
    phase: static candidate-schedule phase — 0 (sched_mult == 0, feature
      only), 1 (0 < sched_mult < 1, blended), 2 (sched_mult == 1, rgb only).
    encode_candidate: static override; TTO disables the candidate branch on a
      trained model (models/nerf_system_optmize.py:265-266).
    Returns dict with s_sigma (B,), and per phase/config: s_feat, s_rgb,
    c_sigma, c_feat | c_rgb.
    """
    use_candidate = cfg.encode_candidate and encode_candidate and phase < 2
    ret: Dict[str, jnp.ndarray] = {}

    w_xyz = pe_weight(progress, cfg.xyz_L, cfg.c2f) if cfg.c2f is not None else None
    input_xyz = positional_encoding(inputs["input_xyz"], cfg.xyz_L, w_xyz)

    lead = input_xyz.shape[:-1]
    per_ray_c = (
        use_candidate and inputs["input_c"].ndim == input_xyz.ndim - 1
    )

    if cfg.fused_trunk and cfg.encode_feat and not sigma_only:
        # Trunk + sigma/xyz_final/feat (+ candidate branch) fused in one
        # Pallas kernel (upnerf.ops.pallas_heads) — the XLA head matmuls
        # are HBM-bound at ~22% MXU utilization otherwise.
        from upnerf.ops.pallas_heads import fused_trunk_heads

        flat = input_xyz.reshape(-1, input_xyz.shape[-1])
        n = flat.shape[0]
        tile = 512 if n % 512 == 0 else 128 if n % 128 == 0 else 8
        pad = (-n) % tile
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
        c_flat = None
        if use_candidate:
            c = inputs["input_c"]
            if per_ray_c:
                c = jnp.broadcast_to(
                    c[..., None, :], (*lead, c.shape[-1])
                )
            c_flat = c.reshape(-1, c.shape[-1])
            if pad:
                c_flat = jnp.pad(c_flat, ((0, pad), (0, 0)))
        trunk_params = tuple((p["w"], p["b"]) for p in params["trunk"])
        heads = {
            "sigma_w": params["share_sigma"]["w"],
            "sigma_b": params["share_sigma"]["b"],
            "xyzf_w": params["xyz_final"]["w"],
            "xyzf_b": params["xyz_final"]["b"],
            "feat_w": params["feat_share"]["w"],
            "feat_b": params["feat_share"]["b"],
        }
        if use_candidate:
            heads.update(
                c1_w=params["cand_enc"][0]["w"], c1_b=params["cand_enc"][0]["b"],
                c2_w=params["cand_enc"][1]["w"], c2_b=params["cand_enc"][1]["b"],
                csig_w=params["cand_sigma"]["w"], csig_b=params["cand_sigma"]["b"],
                cfeat_w=params["cand_feat"]["w"], cfeat_b=params["cand_feat"]["b"],
            )
        outs = fused_trunk_heads(
            flat, c_flat, trunk_params, heads, cfg.skips, tile, precision
        )
        ret["s_sigma"] = outs[0][:n].reshape(*lead)
        ret["s_feat"] = outs[1][:n].reshape(*lead, cfg.feat_dim)
        if use_candidate:
            ret["c_sigma"] = outs[2][:n].reshape(*lead)
            ret["c_feat"] = outs[3][:n].reshape(*lead, cfg.feat_dim)
        if phase > 0:
            ret["s_rgb"] = _rgb_head_on(
                ret["s_feat"], params, cfg, inputs, progress, precision
            )
        return ret

    if cfg.fused_trunk:
        from upnerf.ops.pallas_mlp import fused_trunk

        flat = input_xyz.reshape(-1, input_xyz.shape[-1])
        n = flat.shape[0]
        tile = 1024 if n % 1024 == 0 else 512 if n % 512 == 0 else 128
        pad = (-n) % tile
        if pad:
            flat = jnp.pad(flat, ((0, pad), (0, 0)))
        trunk_params = tuple(
            (p["w"], p["b"]) for p in params["trunk"]
        )
        x = fused_trunk(flat, trunk_params, cfg.skips, tile, precision)
        x = x[:n].reshape(*lead, cfg.W)
    else:
        x = input_xyz
        for i in range(cfg.D):
            if i in cfg.skips:
                x = jnp.concatenate([input_xyz, x], axis=-1)
            x = jax.nn.relu(dense(x, params["trunk"][i], precision))

    ret["s_sigma"] = jax.nn.softplus(dense(x, params["share_sigma"], precision))[..., 0]
    if sigma_only:
        return ret

    xyz_final = dense(x, params["xyz_final"], precision)

    per_ray = inputs["input_dir"].ndim == inputs["input_xyz"].ndim - 1

    def rgb_head(base: jnp.ndarray) -> jnp.ndarray:
        return _rgb_head_on(base, params, cfg, inputs, progress, precision)

    def candidate_branch() -> Dict[str, jnp.ndarray]:
        if per_ray:
            h = jax.nn.relu(
                _split_dense(
                    xyz_final, [inputs["input_c"]], params["cand_enc"][0],
                    cfg.W, precision,
                )
            )
        else:
            c_in = jnp.concatenate([xyz_final, inputs["input_c"]], axis=-1)
            h = jax.nn.relu(dense(c_in, params["cand_enc"][0], precision))
        h = jax.nn.relu(dense(h, params["cand_enc"][1], precision))
        out = {
            "c_sigma": jax.nn.softplus(dense(h, params["cand_sigma"], precision))[..., 0]
        }
        if cfg.encode_feat:
            out["c_feat"] = dense(h, params["cand_feat"], precision)
        else:
            out["c_rgb"] = dense(h, params["cand_rgb"], precision)
        return out

    if cfg.encode_feat:
        ret["s_feat"] = dense(xyz_final, params["feat_share"], precision)
        if use_candidate:
            ret.update(candidate_branch())
        if phase > 0:
            ret["s_rgb"] = rgb_head(ret["s_feat"])
    else:
        ret["s_rgb"] = rgb_head(xyz_final)
        if use_candidate:
            ret.update(candidate_branch())
    return ret
