"""Pallas TPU kernel: fully-fused TRAINING render — trunk + heads +
candidate branch + RGB head + alpha compositing, forward AND backward.

This is the training-path completion of the forward-only mega-kernel
(pallas_render.py): the round-1 profile showed ~28 ms of the 84 ms blended
train step is HBM round-trips of per-SAMPLE tensors — the (N, 256) trunk
output and the (N, 384) s_feat/c_feat maps — between the head matmuls, the
compositing reductions, and their backward reads (docs/ROADMAP.md). Here
nothing per-sample ever reaches HBM except the PE input and its gradient:
the kernel consumes x0 = PE(xyz) and emits only per-RAY maps plus the
(R, S) sample weights.

Math covered (models/nerf.py:80-124, models/rendering.py:86-219):

  h       = trunk(x0)                       # D x dense+ReLU, skip concat
  s_sigma = softplus(h @ Ws + bs)
  xyzf    = h @ Wx + bx
  s_feat  = xyzf @ Wf + bf                                  [feat or rgb]
  rgbh    = relu(s_feat @ Wr1 + ray_cond); rgb = sigmoid(rgbh @ Wr2 + br2)
  cand    : h1 = relu(xyzf @ Wc1x + (c_emb @ Wc1c + b1));  h2 = relu(...)
            c_sigma = softplus(h2 @ Wcs); c_feat = h2 @ Wcf + bcf
  compositing (exact volume.py semantics, last delta 1e2):
    T_s  = exp(-excl_cumsum(delta * s_sigma))     s-only transmittance
    ow   = (1 - exp(-delta*s_sigma)) * T_s        -> s_weights, s_rgb, s_depth
    T_j  = exp(-excl_cumsum(delta * (s_sigma + c_sigma)))
    sw/cw/jw = a_s/a_c/a_j * T_j                  -> feat, c_weights, c_depth,
                                                     t_weight

The backward is a single custom-VJP kernel: because every live cotangent
entering the render is PER-RAY (g_feat (R,F), g_rgb (R,3), g_depth (R,)),
the per-sample cotangents are rank-1 expansions (w_s * g[r]) plus a
division-free compositing chain term:

  d s_sigma_s = delta_s * [ e_s T_s g_ow_s  - suffix_{t>s}(g_ow_t ow_t) ]
              + delta_s * [ e^a_s T_j g_sw_s + e^j_s T_j g_jw_s - suffix(m) ]
  d c_sigma_s = delta_s * [ e^b_s T_j g_cw_s + e^j_s T_j g_jw_s - suffix(m) ]
      with m_t = g_sw_t sw_t + g_cw_t cw_t + g_jw_t jw_t,  e = exp(-delta*sigma)

(the exclusive prefix/suffix sums run as strictly-triangular S x S matmuls
on the MXU). The forward saves cheap residuals to HBM — the (R, S) sigmas
plus the per-sample feat/cfeat/rgb head outputs in the storage dtype
(bf16 in bf16 mode) — so the backward needs only ONE recompute of the
activation chain (the reverse weight-gradient walk), not two: the
compositing backward reads the residual sigmas directly, the per-ray
inner products <g_feat, feat_s> etc. come from the residual head outputs,
and the walk reuses the residual feat/rgb instead of re-deriving them.
The walk runs in ray-subgroup subtiles so the stored chain always fits
VMEM; all weight gradients accumulate across the sequential grid.

Gradients are returned for x0, ray_cond, c_emb and every weight; z_vals has
no trainable ancestry anywhere in the training path (coarse z comes from
scene near/far constants; fine z passes through the stop_gradient'ed
importance weights, models/rendering.py:271,280), so its cotangent is None.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Set True to run in the Pallas interpreter (CPU tests).
INTERPRET = False


def _store_dtype(st: "RTStatic"):
    if st.precision == "bfloat16" and not st.store_f32:
        return jnp.bfloat16
    return jnp.float32

LAST_DELTA = 1e2  # models/rendering.py:126-128

HEAD_BASE = ("xyzf_w", "xyzf_b", "sigma_w", "sigma_b")
HEAD_FEAT = ("feat_w", "feat_b")
HEAD_RGB = ("rgb1_w", "rgb2_w", "rgb2_b")
HEAD_CAND = (
    "c1x_w", "c1c_w", "c1_b", "c2_w", "c2_b",
    "csig_w", "csig_b", "cfeat_w", "cfeat_b",
)


class RTStatic(NamedTuple):
    """Static (hashable) kernel configuration.

    xyz_L > 0 selects the RAYS frontend: the kernel consumes per-ray
    (origin, direction) + per-sample z and builds xyz = o + d*z plus the
    annealed positional encoding IN-KERNEL (fwd and bwd), so neither the
    (R*S, 3+6L) PE tensor nor its cotangent ever touch HBM; the backward
    emits (R, 3) d_origin/d_direction directly (the pose-gradient path).
    xyz_L == 0 keeps the legacy x0 interface (pre-built PE input).

    store_f32: storage dtype for the per-sample feat/cfeat/rgb scratch +
    residuals in bfloat16 mode. bf16 storage halves VMEM/HBM traffic but
    rounds the per-sample features the compositing VALUES and backward
    inner products read; pose recovery is driven by exactly those feature
    gradients (see docs/DESIGN.md "Pose-recovery regression hunt").

    trunk_3x: bf16_3x trunk matmuls (hand-rolled hi/lo operand split;
    Mosaic rejects Precision.HIGH). Measured in the r2 regression hunt:
    it tightens the se3 gradient against the f32 truth (rel 0.028 vs
    0.061 plain-bf16) but costs 45.8k -> 24.6k rays/s, and the suspected
    quality regression it targeted turned out to be seed variance — so it
    stays OFF by default."""

    D: int
    skips: Tuple[int, ...]
    use_cand: bool
    use_rgb: bool
    out_feat: bool
    precision: str = "float32"
    ray_tile: int = 8
    xyz_L: int = 0
    store_f32: bool = True
    trunk_3x: bool = False
    # VMEM budget (MB) for one ray-subgroup's stored walk chain; sets the
    # subgroup size G in _group_rows and therefore the matmul M-dim.
    group_budget_mb: int = 24
    # save_chain: the forward additionally writes the trunk activations +
    # xyzf/rgbh/h1/h2 to HBM (compute dtype, bf16 in bf16 mode) and the
    # backward reads them instead of recomputing the whole chain — trades
    # ~1.2 MFLOP/sample of MXU recompute for streamed HBM traffic the
    # block pipeline hides (docs/ROADMAP.md "last kernel headroom").
    # Numerics: the stored bf16 acts equal the values the recompute's
    # _dot cast would produce; only sub-bf16-epsilon ReLU mask flips
    # differ.
    save_chain: bool = False
    # param_grads=False: the backward computes ONLY the data-path
    # cotangents (d_rays / d_cond / d_cemb) and skips every dW = x^T dy
    # accumulation — for frozen-model consumers (TTO optimizes only the
    # test pose + appearance embedding, nerf_system_optmize.py:60-76,
    # while pallas_call is opaque to XLA's DCE, so the dead parameter
    # gradients cannot be elided from outside the kernel). The VJP
    # returns zeros for the trunk/head cotangents.
    param_grads: bool = True

    @property
    def use_feat(self) -> bool:
        return self.out_feat or self.use_rgb

    @property
    def head_keys(self) -> Tuple[str, ...]:
        keys = list(HEAD_BASE)
        if self.use_feat:
            keys += HEAD_FEAT
        if self.use_rgb:
            keys += HEAD_RGB
        if self.use_cand:
            keys += HEAD_CAND
        return tuple(keys)

    @property
    def out_keys(self) -> Tuple[str, ...]:
        keys = ["s_weights", "s_depth"]
        if self.use_rgb:
            keys.append("rgb_map")
        if self.out_feat:
            keys.append("feat_map")
        if self.use_cand:
            keys += ["j_weights", "c_depth", "t_weight"]
        return tuple(keys)

    @property
    def bwd_t_keys(self) -> Tuple[str, ...]:
        """Head weights whose TRANSPOSE the backward kernel consumes.
        Passed as extra pre-transposed inputs: a `.T` inside the kernel
        body is a Mosaic relayout re-executed on every grid step (256x at
        the flagship batch), while the XLA-side transpose runs once per
        train step. sigma/csig columns ride along so their (W,1)->(1,W)
        reshape is also hoisted."""
        keys = ["xyzf_w", "sigma_w"]
        if self.use_feat:
            keys.append("feat_w")
        if self.use_rgb:
            keys += ["rgb1_w", "rgb2_w"]
        if self.use_cand:
            keys += ["c1x_w", "c1c_w", "c2_w", "cfeat_w", "csig_w"]
        return tuple(keys)

    @property
    def res_keys(self) -> Tuple[str, ...]:
        """Forward residuals saved for the backward (skip pass-1 recompute):
        sigmas for the compositing backward, head outputs for the per-ray
        cotangent inner products + the reverse walk."""
        keys = ["sig_s"]
        if self.use_cand:
            keys.append("sig_c")
        if not self.save_chain:
            # with the chain saved, feat/cfeat are NOT written to HBM: the
            # backward recomputes them from the stored xyzf/h2 in two
            # matmuls — bit-identical f32 values (same bf16 operands, same
            # accumulation) for ~5 GB/step less residual traffic.
            if self.use_feat:
                keys.append("feat")
            if self.out_feat and self.use_cand:
                keys.append("cfeat")
        if self.use_rgb:
            keys.append("rgb")
        if self.save_chain:
            keys.append("chain")
        return tuple(keys)

    def chain_cols(self, W: int, HH: int, HC: int) -> Tuple[Tuple[str, int], ...]:
        """Column layout of the saved walk chain: (name, width) segments,
        concatenated along the feature axis of one (R*S, total) tensor."""
        segs = [(f"act{i}", W) for i in range(self.D)]
        segs.append(("xyzf", W))
        if self.use_rgb:
            segs.append(("rgbh", HH))
        if self.use_cand:
            segs += [("h1", HC), ("h2", HC)]
        return tuple(segs)


_BIG_HEADS = (
    "xyzf_w", "feat_w", "rgb1_w", "rgb2_w", "c1x_w", "c1c_w", "c2_w",
    "cfeat_w",
)


def _prep_weights(trunk, heads, st: "RTStatic"):
    """Pre-cast the big matmul weights to bf16 on the XLA side — once per
    train step — so the kernel body (re-executed on EVERY grid step) skips
    the per-weight f32->bf16 casts. Numerically identical: `_dot`'s astype
    becomes a no-op on an already-bf16 operand. Biases and the (W, 1)
    sigma columns stay f32: they are consumed in f32 adds / rank-1 VPU
    updates, never as wide bf16 matmul operands. trunk_3x needs the f32
    weights in-kernel for its hi/lo split, so it opts out."""
    if st.precision != "bfloat16" or st.trunk_3x:
        return trunk, heads
    trunk = tuple((w.astype(jnp.bfloat16), b) for w, b in trunk)
    heads = {
        k: (v.astype(jnp.bfloat16) if k in _BIG_HEADS else v)
        for k, v in heads.items()
    }
    return trunk, heads


def _dot(a, b, compute_dtype):
    if compute_dtype == jnp.bfloat16:
        a = a.astype(jnp.bfloat16)
        b = b.astype(jnp.bfloat16)
        return jnp.dot(a, b, preferred_element_type=jnp.float32)
    # f32 mode must request f32 MXU passes (see pallas_mlp._dot: Mosaic dot
    # precision defaults to one bf16 pass even for f32 operands).
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _trunk_dot(a, b, compute_dtype, trunk_3x=False):
    """Trunk matmul: one-pass bf16 like the heads, or bf16_3x
    (a@b ~= ah@bh + ah@bl + al@bh; al@bl is below f32 rounding) when
    RTStatic.trunk_3x is set."""
    if compute_dtype == jnp.bfloat16 and trunk_3x:
        a = a.astype(jnp.float32)
        b = b.astype(jnp.float32)
        ah = a.astype(jnp.bfloat16)
        bh = b.astype(jnp.bfloat16)
        al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
        bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)

        def d(x, y):
            return jnp.dot(x, y, preferred_element_type=jnp.float32)

        return d(ah, bh) + d(ah, bl) + d(al, bh)
    return _dot(a, b, compute_dtype)


def _pos(t):
    """ReLU mask robust to bf16 storage: Mosaic's vector cmpf has no bf16
    lowering, so compare in f32 (bf16 rounding preserves sign, making the
    mask identical to the one the f32 recompute produced)."""
    if t.dtype == jnp.bfloat16:
        t = t.astype(jnp.float32)
    return t > 0


def _tri(S: int, lower: bool) -> jnp.ndarray:
    r = jax.lax.broadcasted_iota(jnp.int32, (S, S), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (S, S), 1)
    return (r > c if lower else r < c).astype(jnp.float32)


def _prefix_excl(x, S):
    """out[:, s] = sum_{t<s} x[:, t] — strictly-upper matmul (MXU)."""
    return jnp.dot(
        x, _tri(S, lower=False), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _suffix_excl(x, S):
    """out[:, s] = sum_{t>s} x[:, t] — strictly-lower matmul (MXU)."""
    return jnp.dot(
        x, _tri(S, lower=True), preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _lane0(x_gs):
    """(G, S) per-sample scalars -> (G*S, 128) with the value in lane 0 and
    zeros elsewhere. Mosaic cannot shape-cast (G, S) -> (G*S, 1) (lane ->
    sublane), so rank-1 sigma cotangents go through a masked 128-lane
    extension: h.T @ lane0(gs) puts the true (W, 1) gradient in column 0."""
    G, S = x_gs.shape
    ext = jnp.broadcast_to(x_gs[:, :, None], (G, S, 128)).reshape(G * S, 128)
    lane = jax.lax.broadcasted_iota(jnp.int32, (G * S, 128), 1)
    return jnp.where(lane == 0, ext, 0.0)


def _f32_dot(a, b):
    """Exact f32 matmul for the tiny PE selection contractions (bf16
    rounding of the xyz coordinates would shift the sin arguments)."""
    return jnp.dot(
        a, b, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pe_consts(L: int):
    """Lane-efficient PE constants over the n = 6L encoding columns in the
    torch layout [sin_x(L), cos_x(L), sin_y(L), cos_y(L), sin_z(L),
    cos_z(L)] (models/nerf.py positional_encoding):

      sel (3, n)   — column j reads coordinate j // 2L (selection matmul
                     replaces per-coordinate lane slicing/broadcasts,
                     which relayout on Mosaic);
      wsel (L, n)  — column j takes anneal weight j % L;
      freqmap (1,n)— 2^(j % L) * pi;
      phasemap(1,n)— pi/2 on cos columns (cos x = sin(x + pi/2), so ONE
                     fused sin covers the whole encoding).
    Mosaic's tpu.iota is integer-only; build int32 then convert."""
    n = 6 * L
    j = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    l = j % L
    freqmap = jnp.exp2(l.astype(jnp.float32)) * jnp.pi
    phasemap = ((j // L) % 2).astype(jnp.float32) * (jnp.pi / 2)
    i3 = jax.lax.broadcasted_iota(jnp.int32, (3, n), 0)
    j3 = jax.lax.broadcasted_iota(jnp.int32, (3, n), 1)
    sel = (j3 // (2 * L) == i3).astype(jnp.float32)
    iL = jax.lax.broadcasted_iota(jnp.int32, (L, n), 0)
    jL = jax.lax.broadcasted_iota(jnp.int32, (L, n), 1)
    wsel = (jL % L == iL).astype(jnp.float32)
    return sel, wsel, freqmap, phasemap


def _pe_forward(o_g, d_g, z_g, pw_row, L):
    """In-kernel xyz + annealed PE for one ray subgroup.

    o_g, d_g: (G, 3); z_g: (G, S); pw_row: (1, L) band weights. Returns
    x0 (G*S, 3 + 6L) plus (sp, wn) carried to the backward."""
    G, S = z_g.shape
    M = G * S
    xyz = (o_g[:, None, :] + d_g[:, None, :] * z_g[..., None]).reshape(M, 3)
    sel, wsel, freqmap, phasemap = _pe_consts(L)
    sp = _f32_dot(xyz, sel) * freqmap + phasemap  # (M, 6L)
    wn = _f32_dot(pw_row, wsel)  # (1, 6L)
    enc = jnp.sin(sp) * wn
    return jnp.concatenate([xyz, enc], axis=1), (sp, wn)


def _pe_backward(dx0, pe_cache, z_g, L):
    """d x0 -> (d_origin (G, 3), d_direction (G, 3)) for one subgroup.

    d sin(sp) = cos(sp) dsp; column sums back onto the 3 coordinates run
    as a (M, 6L) @ (6L, 3) selection matmul. Then the per-ray reductions
    d_o = sum_s dxyz, d_d = sum_s dxyz * z."""
    sp, wn = pe_cache
    G, S = z_g.shape
    sel, _, freqmap, _ = _pe_consts(L)
    dspec = dx0[:, 3:] * wn * jnp.cos(sp) * freqmap
    dxyz = dx0[:, 0:3] + _f32_dot(dspec, sel.T)
    dxyz3 = dxyz.reshape(G, S, 3)
    d_o = dxyz3.sum(axis=1)
    d_d = (dxyz3 * z_g[..., None]).sum(axis=1)
    return d_o, d_d


def _trunk_chain_multi(x0s, trunk, D, skips, cdt, trunk_3x=False):
    """Trunk chains for several independent ray subgroups, LAYER-MAJOR:
    all subgroups' layer-i matmuls are traced before any layer-i+1 op, so
    Mosaic (an in-order scheduler — measured: subgroup-major G=4 == G=8)
    can overlap subgroup B's MXU matmul with subgroup A's VPU epilogue
    (bias+relu+cast ~0.54 us vs matmul ~0.68 us at M=1024: the serialized
    pair is exactly the measured ~55%-of-peak ceiling)."""
    inputss = [[] for _ in x0s]
    actss = [[] for _ in x0s]
    hs = list(x0s)
    for i in range(D):
        w, b = trunk[i]
        for j, x0 in enumerate(x0s):
            h = hs[j]
            if i in skips and i > 0:
                h = jnp.concatenate([x0, h], axis=-1)
            inputss[j].append(h)
            hs[j] = jnp.maximum(_trunk_dot(h, w, cdt, trunk_3x) + b, 0.0)
            actss[j].append(hs[j])
    return inputss, actss


def _trunk_chain(x0, trunk, D, skips, cdt, trunk_3x=False):
    inputss, actss = _trunk_chain_multi([x0], trunk, D, skips, cdt, trunk_3x)
    return inputss[0], actss[0]


def _deltas(z):
    R = z.shape[0]
    return jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((R, 1), LAST_DELTA, jnp.float32)], -1
    )


def _group_rows(st: RTStatic, S: int, in0: int, W: int, F: int = 0) -> int:
    """Rays per in-kernel subgroup: keep the stored activation chain +
    head tensors under ~4 MB of VMEM (Mosaic stack accounting also covers
    the in/out blocks, scratch, and weight-grad accumulators, so the
    subgroup slice of the budget must stay small)."""
    bpe = 2 if st.precision == "bfloat16" else 4
    spe = 2 if _store_dtype(st) == jnp.bfloat16 else 4
    if st.save_chain:
        # chain streamed from HBM: only the walk's live tensors stay
        per_row = 6 * W * bpe
    else:
        per_row = (st.D + 4) * W * bpe    # trunk chain + xyzf/walk temps
    per_row += 3 * max(F, 1) * spe        # feat/cfeat/g_f-width tensors
    per_row += 4 * 128 * bpe              # lane-padded (M,1)/(M,3)/lane0
    # With the Mosaic VMEM cap raised to 64 MB (_compiler_params), bigger
    # subgroups buy larger matmul M-dims (better MXU utilization); the
    # budget keeps total residency comfortably under the cap.
    budget = st.group_budget_mb * 2**20
    g = max(1, budget // max(S * per_row, 1))
    while st.ray_tile % g != 0:
        g -= 1
    return g


def _head_fwd_multi(hs, cond_gs, cemb_gs, heads, st: RTStatic, cdt, G,
                    with_sigma=True, ress=None):
    """Head math for several independent ray subgroups, STAGE-MAJOR (see
    _trunk_chain_multi for why). hs[j]: (M, W) with M = G*Sg; cond_gs[j]:
    (G, Hh) per-ray rgb conditioning; cemb_gs[j]: (G, C). Returns a dict
    of per-sample tensors per subgroup. Sigmas come back as (G, Sg): an
    (M, 1) tensor lane-pads to 128 in VMEM, so the single-column matmul
    results are collapsed immediately.

    ress (backward reverse-walk only): forward residuals per subgroup —
    "feat"/"rgb" replace their recompute matmuls (in bf16 mode the stored
    value equals the recompute after the _dot input cast), and c_feat is
    skipped entirely (the walk never reads it)."""
    n = len(hs)
    js = range(n)
    os_: list = [{} for _ in js]
    Sgs = [h.shape[0] // G for h in hs]
    res_of = (lambda j: ress[j]) if ress is not None else (lambda j: None)
    if with_sigma:
        for j in js:
            sig_pre = _dot(hs[j], heads["sigma_w"], cdt) + heads["sigma_b"]
            os_[j]["sigma"] = jax.nn.softplus(sig_pre).reshape(G, Sgs[j])
    for j in js:
        os_[j]["xyzf"] = _dot(hs[j], heads["xyzf_w"], cdt) + heads["xyzf_b"]
    if st.use_feat:
        for j in js:
            if res_of(j) is not None:
                os_[j]["feat"] = res_of(j)["feat"]
            else:
                os_[j]["feat"] = (
                    _dot(os_[j]["xyzf"], heads["feat_w"], cdt)
                    + heads["feat_b"]
                )
    if st.use_rgb:
        for j in js:
            M = hs[j].shape[0]
            pre = _dot(os_[j]["feat"], heads["rgb1_w"], cdt)
            pre = (
                pre.reshape(G, Sgs[j], -1) + cond_gs[j][:, None, :]
            ).reshape(M, -1)
            os_[j]["rgbh"] = jnp.maximum(pre, 0.0)
        for j in js:
            if res_of(j) is not None:
                os_[j]["rgb"] = res_of(j)["rgb"]
            else:
                os_[j]["rgb"] = jax.nn.sigmoid(
                    _dot(os_[j]["rgbh"], heads["rgb2_w"], cdt)
                    + heads["rgb2_b"]
                )
    if st.use_cand:
        for j in js:
            M = hs[j].shape[0]
            ray_part = _dot(cemb_gs[j], heads["c1c_w"], cdt) + heads["c1_b"]
            pre1 = _dot(os_[j]["xyzf"], heads["c1x_w"], cdt)
            pre1 = (
                pre1.reshape(G, Sgs[j], -1) + ray_part[:, None, :]
            ).reshape(M, -1)
            os_[j]["h1"] = jnp.maximum(pre1, 0.0)
        for j in js:
            os_[j]["h2"] = jnp.maximum(
                _dot(os_[j]["h1"], heads["c2_w"], cdt) + heads["c2_b"], 0.0
            )
        if with_sigma:
            for j in js:
                csig_pre = (
                    _dot(os_[j]["h2"], heads["csig_w"], cdt)
                    + heads["csig_b"]
                )
                os_[j]["c_sigma"] = jax.nn.softplus(csig_pre).reshape(
                    G, Sgs[j]
                )
        for j in js:
            if res_of(j) is None:
                os_[j]["c_feat"] = (
                    _dot(os_[j]["h2"], heads["cfeat_w"], cdt)
                    + heads["cfeat_b"]
                )
    return os_


def _head_fwd(h, cond_g, cemb_ray, heads, st: RTStatic, cdt, G,
              with_sigma=True, res=None):
    return _head_fwd_multi(
        [h], [cond_g], [cemb_ray], heads, st, cdt, G,
        with_sigma=with_sigma, ress=[res] if res is not None else None,
    )[0]


def _composite(sig_s, sig_c, z, st: RTStatic):
    """All compositing quantities from the (Rt, S) sigmas. f32."""
    S = z.shape[1]
    delta = _deltas(z)
    ds = delta * sig_s
    Ts = jnp.exp(-_prefix_excl(ds, S))
    a_s = 1.0 - jnp.exp(-ds)
    ow = a_s * Ts
    out = dict(delta=delta, Ts=Ts, a_s=a_s, ow=ow)
    if st.use_cand:
        dc = delta * sig_c
        dj = ds + dc
        Tj = jnp.exp(-_prefix_excl(dj, S))
        a_c = 1.0 - jnp.exp(-dc)
        a_j = 1.0 - jnp.exp(-dj)
        out.update(
            Tj=Tj, a_c=a_c, a_j=a_j, sw=a_s * Tj, cw=a_c * Tj, jw=a_j * Tj
        )
    return out


# ---------------------------------------------------------------------------
# forward kernel


def _fwd_kernel(*refs, st: RTStatic, S: int, G: int, save_res: bool):
    it = list(refs)
    if st.xyz_L:
        o_ref = it.pop(0)
        d_ref = it.pop(0)
        z_ref = it.pop(0)
        pw_ref = it.pop(0)
        x_ref = None
    else:
        x_ref = it.pop(0)
        z_ref = it.pop(0)
    cond_ref = it.pop(0) if st.use_rgb else None
    cemb_ref = it.pop(0) if st.use_cand else None
    trunk = [(it.pop(0)[:], it.pop(0)[:]) for _ in range(st.D)]
    heads = {k: it.pop(0)[:] for k in st.head_keys}
    outs = {k: it.pop(0) for k in st.out_keys}
    if save_res:
        # residuals are extra OUTPUTS (written per tile, read back below);
        # in save_chain mode feat/cfeat are VMEM-only scratch (trailing
        # args) — compositing still reads them, but they never reach HBM
        scr = {k: it.pop(0) for k in st.res_keys}
        if st.save_chain and st.out_feat:
            scr["feat"] = it.pop(0)
            if st.use_cand:
                scr["cfeat"] = it.pop(0)
    else:
        # scratch (trailing args)
        scr = {"sig_s": it.pop(0)}
        if st.use_cand:
            scr["sig_c"] = it.pop(0)
        if st.out_feat:
            scr["feat"] = it.pop(0)
            if st.use_cand:
                scr["cfeat"] = it.pop(0)
        if st.use_rgb:
            scr["rgb"] = it.pop(0)
    assert not it, len(it)

    cdt = jnp.bfloat16 if st.precision == "bfloat16" else jnp.float32
    sdt = _store_dtype(st)
    Rt = st.ray_tile
    z = z_ref[:].astype(jnp.float32)
    pw_row = pw_ref[:].reshape(1, st.xyz_L) if st.xyz_L else None

    g0s = list(range(0, Rt, G))
    x0s, cond_gs, cemb_gs = [], [], []
    for g0 in g0s:
        if st.xyz_L:
            x0, _ = _pe_forward(
                o_ref[g0:g0 + G, :], d_ref[g0:g0 + G, :], z[g0:g0 + G, :],
                pw_row, st.xyz_L,
            )
        else:
            x0 = x_ref[g0 * S:(g0 + G) * S, :]
        x0s.append(x0)
        cond_gs.append(
            cond_ref[g0:g0 + G, :] if cond_ref is not None else None
        )
        cemb_gs.append(
            cemb_ref[g0:g0 + G, :] if cemb_ref is not None else None
        )
    _, actss = _trunk_chain_multi(x0s, trunk, st.D, st.skips, cdt, st.trunk_3x)
    os_ = _head_fwd_multi(
        [a[-1] for a in actss], cond_gs, cemb_gs, heads, st, cdt, G
    )
    for j, g0 in enumerate(g0s):
        r0, r1 = g0 * S, (g0 + G) * S
        acts, o = actss[j], os_[j]
        if save_res and st.save_chain:
            ch = scr["chain"]
            segs = acts + [o["xyzf"]]
            if st.use_rgb:
                segs.append(o["rgbh"])
            if st.use_cand:
                segs += [o["h1"], o["h2"]]
            col = 0
            for t in segs:
                ch[r0:r1, col:col + t.shape[1]] = t.astype(ch.dtype)
                col += t.shape[1]
        scr["sig_s"][g0:g0 + G, :] = o["sigma"]
        if st.use_cand:
            scr["sig_c"][g0:g0 + G, :] = o["c_sigma"]
        if "feat" in scr:
            scr["feat"][r0:r1, :] = o["feat"].astype(sdt)
        if "cfeat" in scr:
            scr["cfeat"][r0:r1, :] = o["c_feat"].astype(sdt)
        if st.use_rgb:
            scr["rgb"][r0:r1, :] = o["rgb"].astype(sdt)

    sig_s = scr["sig_s"][:]
    sig_c = scr["sig_c"][:] if st.use_cand else None
    c = _composite(sig_s, sig_c, z, st)

    outs["s_weights"][:] = c["ow"]
    outs["s_depth"][:] = (c["ow"] * z).sum(axis=1, keepdims=True)
    if st.use_rgb:
        rgb = scr["rgb"][:].astype(jnp.float32).reshape(Rt, S, -1)
        outs["rgb_map"][:] = (c["ow"][..., None] * rgb).sum(axis=1)
    if st.out_feat:
        f3 = scr["feat"][:].astype(jnp.float32).reshape(Rt, S, -1)
        wf = c["sw"] if st.use_cand else c["ow"]
        fm = (wf[..., None] * f3).sum(axis=1)
        if st.use_cand:
            g3 = scr["cfeat"][:].astype(jnp.float32).reshape(Rt, S, -1)
            fm = fm + (c["cw"][..., None] * g3).sum(axis=1)
        outs["feat_map"][:] = fm
    if st.use_cand:
        outs["j_weights"][:] = c["jw"]
        outs["c_depth"][:] = (c["jw"] * z).sum(axis=1, keepdims=True)
        outs["t_weight"][:] = c["cw"].sum(axis=1, keepdims=True)


# ---------------------------------------------------------------------------
# backward kernel


def _bwd_kernel(*refs, st: RTStatic, S: int, G: int, in0: int):
    it = list(refs)
    if st.xyz_L:
        o_ref = it.pop(0)
        d_ref = it.pop(0)
        z_ref = it.pop(0)
        pw_ref = it.pop(0)
        x_ref = None
    else:
        x_ref = it.pop(0)
        z_ref = it.pop(0)
    cond_ref = it.pop(0) if st.use_rgb else None
    cemb_ref = it.pop(0) if st.use_cand else None
    trunk = [(it.pop(0)[:], it.pop(0)[:]) for _ in range(st.D)]
    heads = {k: it.pop(0)[:] for k in st.head_keys}
    trunkT = [it.pop(0)[:] for _ in range(st.D)]
    headsT = {k: it.pop(0)[:] for k in st.bwd_t_keys}
    cots = {k: it.pop(0) for k in st.out_keys}
    res = {k: it.pop(0) for k in st.res_keys}
    if st.xyz_L:
        do_ref = it.pop(0)
        dd_ref = it.pop(0)
        dx_ref = None
    else:
        dx_ref = it.pop(0)
    dcond_ref = it.pop(0) if st.use_rgb else None
    dcemb_ref = it.pop(0) if st.use_cand else None
    if st.param_grads:
        dtrunk_refs = [(it.pop(0), it.pop(0)) for _ in range(st.D)]
        dhead_refs = {k: it.pop(0) for k in st.head_keys}
    assert not it, len(it)

    cdt = jnp.bfloat16 if st.precision == "bfloat16" else jnp.float32
    Rt = st.ray_tile
    step = pl.program_id(0)
    z = z_ref[:].astype(jnp.float32)
    pw_row = pw_ref[:].reshape(1, st.xyz_L) if st.xyz_L else None

    g_feat = cots["feat_map"][:].astype(jnp.float32) if st.out_feat else None
    g_rgbm = cots["rgb_map"][:].astype(jnp.float32) if st.use_rgb else None

    # --- per-ray cotangent inner products from the residuals (no pass-1
    # chain recompute: the forward saved sigmas + head outputs). In
    # save_chain mode feat/cfeat were NOT stored: re-derive them from the
    # stored xyzf/h2 — same bf16 operands, same f32 accumulation, so the
    # values are bit-identical to what the forward composited. -----------
    chain_cuts = None
    if st.save_chain:
        Wt = trunk[0][0].shape[1]
        HHw = heads["rgb1_w"].shape[1] if st.use_rgb else 0
        HCw = heads["c2_w"].shape[1] if st.use_cand else 0
        chain_cuts, col = {}, 0
        for name, w in st.chain_cols(Wt, HHw, HCw):
            chain_cuts[name] = (col, w)
            col += w

    def _chain_seg(rows, name):
        c0, w = chain_cuts[name]
        return res["chain"][rows, c0:c0 + w]

    feat_res = rgb_res = cfeat_res = None
    # feat values feed (a) the feat_map cotangent inner products (out_feat)
    # and (b) the rgb1_w dW dot (param_grads); when neither consumer is
    # live (frozen-model rgb phase) skip re-deriving them entirely.
    need_feat = st.use_feat and (
        st.out_feat or st.param_grads or not st.save_chain
    )
    if need_feat:
        if st.save_chain:
            feat_res = (
                _dot(_chain_seg(slice(None), "xyzf"), heads["feat_w"], cdt)
                + heads["feat_b"]
            )
        else:
            feat_res = res["feat"][:]
    if st.out_feat and st.use_cand:
        if st.save_chain:
            cfeat_res = (
                _dot(_chain_seg(slice(None), "h2"), heads["cfeat_w"], cdt)
                + heads["cfeat_b"]
            )
        else:
            cfeat_res = res["cfeat"][:]
    rgb_res = res["rgb"][:] if st.use_rgb else None
    p_scr = q_scr = rr_scr = None
    if st.out_feat:
        gf3 = g_feat[:, None, :]  # (Rt, 1, F) broadcast over S
        p_scr = (
            feat_res.astype(jnp.float32).reshape(Rt, S, -1) * gf3
        ).sum(axis=-1)
        if st.use_cand:
            q_scr = (
                cfeat_res.astype(jnp.float32).reshape(Rt, S, -1) * gf3
            ).sum(axis=-1)
    if st.use_rgb:
        rr_scr = (
            rgb_res.astype(jnp.float32).reshape(Rt, S, -1)
            * g_rgbm[:, None, :]
        ).sum(axis=-1)

    # --- compositing backward (division-free, all (Rt, S) f32) -----------
    sig_s = res["sig_s"][:]
    sig_c = res["sig_c"][:] if st.use_cand else None
    c = _composite(sig_s, sig_c, z, st)
    delta = c["delta"]

    g_ow = cots["s_weights"][:].astype(jnp.float32)
    g_ow = g_ow + cots["s_depth"][:].astype(jnp.float32) * z
    if st.use_rgb:
        g_ow = g_ow + rr_scr[:]
    if st.out_feat and not st.use_cand:
        g_ow = g_ow + p_scr[:]

    e_s = jnp.exp(-delta * sig_s)
    gsig_s = delta * (e_s * c["Ts"] * g_ow - _suffix_excl(g_ow * c["ow"], S))

    gsig_c = None
    if st.use_cand:
        g_sw = p_scr[:] if st.out_feat else jnp.zeros_like(g_ow)
        g_cw = (
            (q_scr[:] if st.out_feat else jnp.zeros_like(g_ow))
            + cots["t_weight"][:].astype(jnp.float32)
        )
        g_jw = cots["j_weights"][:].astype(jnp.float32)
        g_jw = g_jw + cots["c_depth"][:].astype(jnp.float32) * z
        m = g_sw * c["sw"] + g_cw * c["cw"] + g_jw * c["jw"]
        sfx = _suffix_excl(m, S)
        e_c = jnp.exp(-delta * sig_c)
        e_j = e_s * e_c
        gsig_s = gsig_s + delta * (
            e_s * c["Tj"] * g_sw + e_j * c["Tj"] * g_jw - sfx
        )
        gsig_c = delta * (e_c * c["Tj"] * g_cw + e_j * c["Tj"] * g_jw - sfx)

    # softplus': dsigma/dpre = 1 - exp(-sigma)
    g_spre = gsig_s * (1.0 - jnp.exp(-sig_s))
    g_cpre = gsig_c * (1.0 - jnp.exp(-sig_c)) if st.use_cand else None

    # per-sample rank-1 coefficients
    cf = (c["sw"] if st.use_cand else c["ow"]) if st.out_feat else None
    cg = c["cw"] if (st.out_feat and st.use_cand) else None
    cr = c["ow"] if st.use_rgb else None

    # --- reverse walk: gradient accumulate over the stored (or recomputed)
    # chain, STAGE-MAJOR over the independent ray subgroups (see
    # _trunk_chain_multi): each stage loops over subgroups, letting the
    # in-order scheduler overlap one subgroup's VPU work with another's
    # matmuls. Per-parameter accumulation keeps subgroup order, so the
    # sums are bit-identical to a subgroup-major walk. ------------------
    dparams: Dict[str, Any] = {}

    def _acc(name, val):
        dparams[name] = dparams.get(name, 0.0) + val

    g0s = list(range(0, Rt, G))
    n = len(g0s)
    js = range(n)
    M = G * S

    x0s, pe_caches, cond_gs, cemb_gs, res_gs = [], [], [], [], []
    for g0 in g0s:
        r0, r1 = g0 * S, (g0 + G) * S
        if st.xyz_L:
            x0, pe_cache = _pe_forward(
                o_ref[g0:g0 + G, :], d_ref[g0:g0 + G, :], z[g0:g0 + G, :],
                pw_row, st.xyz_L,
            )
        else:
            x0, pe_cache = x_ref[r0:r1, :], None
        x0s.append(x0)
        pe_caches.append(pe_cache)
        cond_gs.append(
            cond_ref[g0:g0 + G, :] if cond_ref is not None else None
        )
        cemb_gs.append(
            cemb_ref[g0:g0 + G, :] if cemb_ref is not None else None
        )
        res_g = {}
        if feat_res is not None:
            res_g["feat"] = feat_res[r0:r1, :]
        if rgb_res is not None:
            res_g["rgb"] = rgb_res[r0:r1, :]
        res_gs.append(res_g)

    if st.save_chain:
        # stored walk chain: no recompute. The bf16 slices equal the
        # values the recompute's _dot casts would produce, and bf16
        # rounding preserves sign, so the ReLU masks are identical.
        inputss, actss, os_ = [], [], []
        for j, g0 in enumerate(g0s):
            rows = slice(g0 * S, (g0 + G) * S)
            acts = [_chain_seg(rows, f"act{i}") for i in range(st.D)]
            o = {"xyzf": _chain_seg(rows, "xyzf")}
            if st.use_rgb:
                o["rgbh"] = _chain_seg(rows, "rgbh")
                o["rgb"] = res_gs[j]["rgb"]
            if st.use_cand:
                o["h1"] = _chain_seg(rows, "h1")
                o["h2"] = _chain_seg(rows, "h2")
            if st.use_feat and "feat" in res_gs[j]:
                o["feat"] = res_gs[j]["feat"]
            if st.param_grads:  # trunk inputs feed only the dW dots
                x0c = x0s[j].astype(cdt)
                inputs = [x0c]
                for i in range(1, st.D):
                    prev = acts[i - 1]
                    if i in st.skips:
                        prev = jnp.concatenate([x0c, prev], axis=-1)
                    inputs.append(prev)
                inputss.append(inputs)
            actss.append(acts)
            os_.append(o)
    else:
        inputss, actss = _trunk_chain_multi(
            x0s, trunk, st.D, st.skips, cdt, st.trunk_3x
        )
        os_ = _head_fwd_multi(
            [a[-1] for a in actss], cond_gs, cemb_gs, heads, st, cdt, G,
            with_sigma=False, ress=res_gs,
        )
    hs = [a[-1] for a in actss]

    g_xyzfs = [
        jnp.zeros((M, heads["xyzf_w"].shape[1]), jnp.float32) for _ in js
    ]
    g_fs: list = [None] * n
    if st.out_feat:
        for j, g0 in enumerate(g0s):
            gf3 = g_feat[g0:g0 + G][:, None, :]  # (G, 1, F)
            g_fs[j] = (cf[g0:g0 + G][:, :, None] * gf3).reshape(M, -1)
    if st.use_rgb:
        g_us, g_rgbhs = [None] * n, [None] * n
        for j, g0 in enumerate(g0s):
            gr3 = g_rgbm[g0:g0 + G][:, None, :]
            g_rgb = (cr[g0:g0 + G][:, :, None] * gr3).reshape(M, -1)
            # sigmoid'
            o = os_[j]
            g_us[j] = g_rgb * (o["rgb"] * (1.0 - o["rgb"])).astype(
                jnp.float32
            )
        if st.param_grads:
            for j in js:
                _acc("rgb2_w", _dot(os_[j]["rgbh"].T, g_us[j], cdt))
                _acc("rgb2_b", g_us[j].sum(axis=0))
        for j in js:
            g_rgbhs[j] = (
                _dot(g_us[j], headsT["rgb2_w"], cdt) * _pos(os_[j]["rgbh"])
            )
        if st.param_grads:
            for j in js:
                _acc("rgb1_w", _dot(os_[j]["feat"].T, g_rgbhs[j], cdt))
        for j, g0 in enumerate(g0s):
            dcond_ref[g0:g0 + G, :] = (
                g_rgbhs[j].reshape(G, S, -1).sum(axis=1)
            )
        for j in js:
            g_from_rgb = _dot(g_rgbhs[j], headsT["rgb1_w"], cdt)
            g_fs[j] = (
                g_from_rgb if g_fs[j] is None else g_fs[j] + g_from_rgb
            )
    if st.use_feat:
        if st.param_grads:
            for j in js:
                _acc("feat_w", _dot(os_[j]["xyzf"].T, g_fs[j], cdt))
                _acc("feat_b", g_fs[j].sum(axis=0))
        for j in js:
            g_xyzfs[j] = g_xyzfs[j] + _dot(g_fs[j], headsT["feat_w"], cdt)
    if st.use_cand:
        g_cfs, g_h2s, g_h1s = [None] * n, [None] * n, [None] * n
        for j, g0 in enumerate(g0s):
            if st.out_feat:
                g_cfs[j] = (
                    cg[g0:g0 + G][:, :, None]
                    * g_feat[g0:g0 + G][:, None, :]
                ).reshape(M, -1)
            else:
                g_cfs[j] = jnp.zeros(
                    (M, heads["cfeat_w"].shape[1]), jnp.float32
                )
        if st.param_grads:
            for j in js:
                _acc("cfeat_w", _dot(os_[j]["h2"].T, g_cfs[j], cdt))
                _acc("cfeat_b", g_cfs[j].sum(axis=0))
        for j in js:
            g_h2s[j] = _dot(g_cfs[j], headsT["cfeat_w"], cdt)
        for j, g0 in enumerate(g0s):
            g_cpre_g = g_cpre[g0:g0 + G, :]  # (G, S)
            if st.param_grads:
                g_cpre_ext = _lane0(g_cpre_g)
                _acc("csig_w", _dot(os_[j]["h2"].T, g_cpre_ext, cdt)[:, :1])
                _acc("csig_b", g_cpre_ext.sum(axis=0)[:1])
            g_h2s[j] = g_h2s[j] + (
                g_cpre_g[:, :, None]
                * headsT["csig_w"].reshape(1, 1, -1)
            ).reshape(M, -1)
        for j in js:
            g_h2s[j] = g_h2s[j] * _pos(os_[j]["h2"])
        if st.param_grads:
            for j in js:
                _acc("c2_w", _dot(os_[j]["h1"].T, g_h2s[j], cdt))
                _acc("c2_b", g_h2s[j].sum(axis=0))
        for j in js:
            g_h1s[j] = (
                _dot(g_h2s[j], headsT["c2_w"], cdt) * _pos(os_[j]["h1"])
            )
        if st.param_grads:
            for j in js:
                _acc("c1x_w", _dot(os_[j]["xyzf"].T, g_h1s[j], cdt))
                _acc("c1_b", g_h1s[j].sum(axis=0))
        for j, g0 in enumerate(g0s):
            ray_g1 = g_h1s[j].reshape(G, S, -1).sum(axis=1)  # (G, Hc)
            if st.param_grads:
                _acc("c1c_w", _dot(cemb_gs[j].T, ray_g1, cdt))
            dcemb_ref[g0:g0 + G, :] = _dot(ray_g1, headsT["c1c_w"], cdt)
        for j in js:
            g_xyzfs[j] = g_xyzfs[j] + _dot(g_h1s[j], headsT["c1x_w"], cdt)

    g_hs = [None] * n
    for j, g0 in enumerate(g0s):
        g_spre_g = g_spre[g0:g0 + G, :]  # (G, S)
        if st.param_grads:
            g_spre_ext = _lane0(g_spre_g)
            _acc("sigma_w", _dot(hs[j].T, g_spre_ext, cdt)[:, :1])
            _acc("sigma_b", g_spre_ext.sum(axis=0)[:1])
            _acc("xyzf_w", _dot(hs[j].T, g_xyzfs[j], cdt))
            _acc("xyzf_b", g_xyzfs[j].sum(axis=0))
        g_hs[j] = (
            g_spre_g[:, :, None] * headsT["sigma_w"].reshape(1, 1, -1)
        ).reshape(M, -1)
    for j in js:
        g_hs[j] = g_hs[j] + _dot(g_xyzfs[j], headsT["xyzf_w"], cdt)

    # trunk reverse walk (layer-major across subgroups)
    gs = list(g_hs)
    dx0s = [jnp.zeros((M, in0), jnp.float32) for _ in js]
    for i in reversed(range(st.D)):
        for j in js:
            gs[j] = gs[j] * _pos(actss[j][i])
            if st.param_grads:
                _acc(
                    f"trunk{i}_w",
                    _trunk_dot(inputss[j][i].T, gs[j], cdt, st.trunk_3x),
                )
                _acc(f"trunk{i}_b", gs[j].sum(axis=0))
            g_in = _trunk_dot(gs[j], trunkT[i], cdt, st.trunk_3x)
            if i in st.skips and i > 0:
                dx0s[j] = dx0s[j] + g_in[:, :in0]
                gs[j] = g_in[:, in0:]
            elif i == 0:
                dx0s[j] = dx0s[j] + g_in
            else:
                gs[j] = g_in
    for j, g0 in enumerate(g0s):
        if st.xyz_L:
            d_o_g, d_d_g = _pe_backward(
                dx0s[j], pe_caches[j], z[g0:g0 + G, :], st.xyz_L
            )
            do_ref[g0:g0 + G, :] = d_o_g
            dd_ref[g0:g0 + G, :] = d_d_g
        else:
            dx_ref[g0 * S:(g0 + G) * S, :] = dx0s[j]

    if not st.param_grads:
        return

    @pl.when(step == 0)
    def _init():
        for i in range(st.D):
            dtrunk_refs[i][0][:] = dparams[f"trunk{i}_w"]
            dtrunk_refs[i][1][:] = dparams[f"trunk{i}_b"]
        for k in st.head_keys:
            dhead_refs[k][:] = dparams[k]

    @pl.when(step != 0)
    def _accum():
        for i in range(st.D):
            dtrunk_refs[i][0][:] = dtrunk_refs[i][0][:] + dparams[f"trunk{i}_w"]
            dtrunk_refs[i][1][:] = dtrunk_refs[i][1][:] + dparams[f"trunk{i}_b"]
        for k in st.head_keys:
            dhead_refs[k][:] = dhead_refs[k][:] + dparams[k]


# ---------------------------------------------------------------------------
# pallas_call plumbing


def _compiler_params():
    """Raise Mosaic's scoped-VMEM cap (default 16 MB): the flagship tile's
    resident set (feature scratch + blocks + weights) slightly exceeds it;
    v5e has headroom above the conservative default."""
    if INTERPRET:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=100 * 2**20)


def _vmem(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)


def _rows(tile, dim):
    return pl.BlockSpec((tile, dim), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _in_specs_flat(st, front, z_vals, ray_cond, c_emb, trunk, heads):
    """front: {"x0": arr} (legacy) or {"o": .., "d": .., "pe_w": ..}."""
    Rt = st.ray_tile
    S = z_vals.shape[1]
    if st.xyz_L:
        specs = [
            _rows(Rt, 3), _rows(Rt, 3), _rows(Rt, S),
            _vmem(front["pe_w"].shape),
        ]
        flat = [front["o"], front["d"], z_vals, front["pe_w"]]
    else:
        specs = [_rows(Rt * S, front["x0"].shape[1]), _rows(Rt, S)]
        flat = [front["x0"], z_vals]
    if st.use_rgb:
        specs.append(_rows(Rt, ray_cond.shape[1]))
        flat.append(ray_cond)
    if st.use_cand:
        specs.append(_rows(Rt, c_emb.shape[1]))
        flat.append(c_emb)
    for w, b in trunk:
        specs += [_vmem(w.shape), _vmem(b.shape)]
        flat += [w, b]
    for k in st.head_keys:
        specs.append(_vmem(heads[k].shape))
        flat.append(heads[k])
    return specs, flat


def _out_meta(st, R, S, F):
    """(shapes, specs) for the forward outputs, in st.out_keys order."""
    Rt = st.ray_tile
    shapes, specs = [], []
    for k in st.out_keys:
        if k in ("s_weights", "j_weights"):
            shapes.append(jax.ShapeDtypeStruct((R, S), jnp.float32))
            specs.append(_rows(Rt, S))
        elif k in ("s_depth", "c_depth", "t_weight"):
            shapes.append(jax.ShapeDtypeStruct((R, 1), jnp.float32))
            specs.append(_rows(Rt, 1))
        elif k == "rgb_map":
            shapes.append(jax.ShapeDtypeStruct((R, 3), jnp.float32))
            specs.append(_rows(Rt, 3))
        elif k == "feat_map":
            shapes.append(jax.ShapeDtypeStruct((R, F), jnp.float32))
            specs.append(_rows(Rt, F))
    return shapes, specs


def _res_meta(st, R, S, F, sdt, chain_w=0):
    """(shapes, specs) for the saved-for-backward residuals, res_keys
    order. Sigmas stay f32 (the compositing backward is exact); the
    per-sample head outputs use the storage dtype; the optional walk
    chain uses the compute dtype (its consumers cast to it anyway)."""
    Rt = st.ray_tile
    cdt = jnp.bfloat16 if st.precision == "bfloat16" else jnp.float32
    shapes, specs = [], []
    for k in st.res_keys:
        if k in ("sig_s", "sig_c"):
            shapes.append(jax.ShapeDtypeStruct((R, S), jnp.float32))
            specs.append(_rows(Rt, S))
        elif k in ("feat", "cfeat"):
            shapes.append(jax.ShapeDtypeStruct((R * S, F), sdt))
            specs.append(_rows(Rt * S, F))
        elif k == "rgb":
            shapes.append(jax.ShapeDtypeStruct((R * S, 3), sdt))
            specs.append(_rows(Rt * S, 3))
        elif k == "chain":
            shapes.append(jax.ShapeDtypeStruct((R * S, chain_w), cdt))
            specs.append(_rows(Rt * S, chain_w))
    return shapes, specs


def _chain_w(st, heads, W):
    if not st.save_chain:
        return 0
    HH = heads["rgb1_w"].shape[1] if st.use_rgb else 0
    HC = heads["c2_w"].shape[1] if st.use_cand else 0
    return sum(w for _, w in st.chain_cols(W, HH, HC))


def _fwd_scratch(st, S, F, sdt):
    Rt = st.ray_tile
    scr = [pltpu.VMEM((Rt, S), jnp.float32)]  # sig_s
    if st.use_cand:
        scr.append(pltpu.VMEM((Rt, S), jnp.float32))
    if st.out_feat:
        scr.append(pltpu.VMEM((Rt * S, F), sdt))
        if st.use_cand:
            scr.append(pltpu.VMEM((Rt * S, F), sdt))
    if st.use_rgb:
        scr.append(pltpu.VMEM((Rt * S, 3), sdt))
    return scr


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_render_train(
    x0: jnp.ndarray,        # (R*S, in0) PE input, ray-major
    z_vals: jnp.ndarray,    # (R, S) — no trainable ancestry (see module doc)
    ray_cond: Optional[jnp.ndarray],  # (R, W//2) per-ray rgb cond incl bias
    c_emb: Optional[jnp.ndarray],     # (R, C) per-ray candidate embedding
    trunk: Tuple,                      # ((W, b), ...)
    heads: Dict[str, jnp.ndarray],
    st: RTStatic,
) -> Dict[str, jnp.ndarray]:
    assert st.xyz_L == 0
    return _fwd_impl({"x0": x0}, z_vals, ray_cond, c_emb, trunk, heads, st)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_render_train_rays(
    rays_o: jnp.ndarray,    # (R, 3)
    rays_d: jnp.ndarray,    # (R, 3)
    z_vals: jnp.ndarray,    # (R, S) — no trainable ancestry
    pe_w: jnp.ndarray,      # (L,) annealed band weights (ones if no c2f)
    ray_cond: Optional[jnp.ndarray],
    c_emb: Optional[jnp.ndarray],
    trunk: Tuple,
    heads: Dict[str, jnp.ndarray],
    st: RTStatic,
) -> Dict[str, jnp.ndarray]:
    """Rays-frontend variant: xyz = o + d*z and the annealed PE are built
    in-kernel (st.xyz_L > 0); the VJP returns d_rays_o / d_rays_d — the
    pose-gradient path — instead of a (R*S, in0) PE cotangent."""
    assert st.xyz_L > 0
    front = {"o": rays_o, "d": rays_d, "pe_w": pe_w}
    return _fwd_impl(front, z_vals, ray_cond, c_emb, trunk, heads, st)


def _front_in0(st, front, trunk):
    return 3 + 6 * st.xyz_L if st.xyz_L else front["x0"].shape[1]


def _fwd_impl(front, z_vals, ray_cond, c_emb, trunk, heads, st: RTStatic,
              save_res: bool = False):
    R, S = z_vals.shape
    assert R % st.ray_tile == 0, (R, st.ray_tile)
    F = heads["feat_w"].shape[1] if st.use_feat else 0
    in0 = _front_in0(st, front, trunk)
    W = trunk[0][0].shape[1]
    G = _group_rows(st, S, in0, W, F)
    sdt = _store_dtype(st)
    assert not (st.save_chain and st.trunk_3x), "save_chain stores the"\
        " bf16 chain; trunk_3x needs f32 inputs in-kernel"
    trunk, heads = _prep_weights(trunk, heads, st)

    in_specs, flat = _in_specs_flat(st, front, z_vals, ray_cond, c_emb, trunk, heads)
    out_shapes, out_specs = _out_meta(st, R, S, F)
    if save_res:
        res_shapes, res_specs = _res_meta(
            st, R, S, F, sdt, chain_w=_chain_w(st, heads, W)
        )
        out_shapes += res_shapes
        out_specs += res_specs
        scratch = []
        if st.save_chain and st.out_feat:
            Rt = st.ray_tile
            scratch.append(pltpu.VMEM((Rt * S, F), sdt))
            if st.use_cand:
                scratch.append(pltpu.VMEM((Rt * S, F), sdt))
    else:
        scratch = _fwd_scratch(st, S, F, sdt)

    outs = pl.pallas_call(
        functools.partial(_fwd_kernel, st=st, S=S, G=G, save_res=save_res),
        out_shape=tuple(out_shapes),
        grid=(R // st.ray_tile,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        scratch_shapes=scratch,
        interpret=INTERPRET,
        compiler_params=_compiler_params(),
    )(*flat)
    res = dict(zip(st.out_keys, outs[: len(st.out_keys)]))
    for k in ("s_depth", "c_depth", "t_weight"):
        if k in res:
            res[k] = res[k][:, 0]
    if save_res:
        return res, tuple(outs[len(st.out_keys):])
    return res


def _vjp_fwd(x0, z_vals, ray_cond, c_emb, trunk, heads, st):
    out, saved = _fwd_impl(
        {"x0": x0}, z_vals, ray_cond, c_emb, trunk, heads, st, save_res=True
    )
    return out, ({"x0": x0}, z_vals, ray_cond, c_emb, trunk, heads, saved)


def _vjp_fwd_rays(rays_o, rays_d, z_vals, pe_w, ray_cond, c_emb, trunk, heads, st):
    front = {"o": rays_o, "d": rays_d, "pe_w": pe_w}
    out, saved = _fwd_impl(
        front, z_vals, ray_cond, c_emb, trunk, heads, st, save_res=True
    )
    return out, (front, z_vals, ray_cond, c_emb, trunk, heads, saved)


def _bwd_impl(st: RTStatic, res, g):
    front, z_vals, ray_cond, c_emb, trunk, heads, saved = res
    R, S = z_vals.shape
    in0 = _front_in0(st, front, trunk)
    W = trunk[0][0].shape[1]
    Rt = st.ray_tile
    F = heads["feat_w"].shape[1] if st.use_feat else 0
    G = _group_rows(st, S, in0, W, F)
    sdt = _store_dtype(st)
    trunk, heads = _prep_weights(trunk, heads, st)
    # pre-transposed weight copies for the reverse walk (see bwd_t_keys)
    trunkT = tuple(w.T for w, _ in trunk)
    headsT = {k: heads[k].T for k in st.bwd_t_keys}

    in_specs, flat = _in_specs_flat(st, front, z_vals, ray_cond, c_emb, trunk, heads)
    t_flat = list(trunkT) + [headsT[k] for k in st.bwd_t_keys]
    in_specs += [_vmem(t.shape) for t in t_flat]
    flat += t_flat
    # cotangent inputs, same layout as the outputs
    cot_arrays, cot_specs = [], []
    for k in st.out_keys:
        v = g[k]
        if k in ("s_depth", "c_depth", "t_weight"):
            v = v.reshape(R, 1)
        cot_arrays.append(v)
        cot_specs.append(_rows(Rt, v.shape[1]))
    # forward residuals (same layout as the fwd's extra outputs)
    _, res_specs = _res_meta(st, R, S, F, sdt, chain_w=_chain_w(st, heads, W))
    cot_arrays += list(saved)
    cot_specs += res_specs

    if st.xyz_L:
        out_shapes = [
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
            jax.ShapeDtypeStruct((R, 3), jnp.float32),
        ]
        out_specs = [_rows(Rt, 3), _rows(Rt, 3)]
    else:
        out_shapes = [jax.ShapeDtypeStruct((R * S, in0), jnp.float32)]
        out_specs = [_rows(Rt * S, in0)]
    if st.use_rgb:
        out_shapes.append(
            jax.ShapeDtypeStruct((R, ray_cond.shape[1]), jnp.float32)
        )
        out_specs.append(_rows(Rt, ray_cond.shape[1]))
    if st.use_cand:
        out_shapes.append(jax.ShapeDtypeStruct((R, c_emb.shape[1]), jnp.float32))
        out_specs.append(_rows(Rt, c_emb.shape[1]))
    if st.param_grads:
        for w, b in trunk:
            out_shapes += [
                jax.ShapeDtypeStruct(w.shape, jnp.float32),
                jax.ShapeDtypeStruct(b.shape, jnp.float32),
            ]
            out_specs += [_vmem(w.shape), _vmem(b.shape)]
        for k in st.head_keys:
            out_shapes.append(jax.ShapeDtypeStruct(heads[k].shape, jnp.float32))
            out_specs.append(_vmem(heads[k].shape))

    outs = pl.pallas_call(
        functools.partial(_bwd_kernel, st=st, S=S, G=G, in0=in0),
        out_shape=tuple(out_shapes),
        grid=(R // Rt,),
        in_specs=in_specs + cot_specs,
        out_specs=tuple(out_specs),
        interpret=INTERPRET,
        compiler_params=_compiler_params(),
    )(*flat, *cot_arrays)

    i = 0
    if st.xyz_L:
        d_front = (outs[0], outs[1])
        i = 2
    else:
        d_front = (outs[0],)
        i = 1
    dcond = None
    if st.use_rgb:
        dcond = outs[i]; i += 1
    dcemb = None
    if st.use_cand:
        dcemb = outs[i]; i += 1
    if st.param_grads:
        dtrunk = tuple(
            (outs[i + 2 * k], outs[i + 2 * k + 1]) for k in range(st.D)
        )
        i += 2 * st.D
        dheads = {k: outs[i + j] for j, k in enumerate(st.head_keys)}
    else:
        # frozen-model mode: the kernel never computed dW; hand back zero
        # cotangents (XLA DCEs them — the caller isn't differentiating
        # the parameters).
        dtrunk = tuple(
            (jnp.zeros(w.shape, jnp.float32), jnp.zeros(b.shape, jnp.float32))
            for w, b in trunk
        )
        dheads = {
            k: jnp.zeros(heads[k].shape, jnp.float32) for k in st.head_keys
        }
    return d_front, dcond, dcemb, dtrunk, dheads


def _vjp_bwd(st: RTStatic, res, g):
    d_front, dcond, dcemb, dtrunk, dheads = _bwd_impl(st, res, g)
    return d_front[0], None, dcond, dcemb, dtrunk, dheads


def _vjp_bwd_rays(st: RTStatic, res, g):
    d_front, dcond, dcemb, dtrunk, dheads = _bwd_impl(st, res, g)
    d_o, d_d = d_front
    return d_o, d_d, None, None, dcond, dcemb, dtrunk, dheads


fused_render_train.defvjp(_vjp_fwd, _vjp_bwd)
fused_render_train_rays.defvjp(_vjp_fwd_rays, _vjp_bwd_rays)


# ---------------------------------------------------------------------------
# XLA twin (test oracle + non-TPU fallback) — volume.py cumprod semantics


def xla_render_train_rays(
    rays_o, rays_d, z_vals, pe_w, ray_cond, c_emb, trunk, heads, st: RTStatic
):
    """XLA twin of the rays frontend: same xyz + PE construction in jnp."""
    L = st.xyz_L
    R, S = z_vals.shape
    xyz = (
        rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    ).reshape(R * S, 3)
    freq = 2.0 ** jnp.arange(L, dtype=jnp.float32) * jnp.pi
    sp = xyz[:, :, None] * freq  # (M, 3, L)
    enc = jnp.stack([jnp.sin(sp) * pe_w, jnp.cos(sp) * pe_w], axis=-2)
    x0 = jnp.concatenate([xyz, enc.reshape(R * S, 6 * L)], axis=-1)
    return xla_render_train(
        x0, z_vals, ray_cond, c_emb, trunk, heads, st._replace(xyz_L=0)
    )


def xla_render_train(x0, z_vals, ray_cond, c_emb, trunk, heads, st: RTStatic):
    cdt = jnp.bfloat16 if st.precision == "bfloat16" else jnp.float32
    R, S = z_vals.shape
    h = x0
    for i, (w, b) in enumerate(trunk):
        if i in st.skips and i > 0:
            h = jnp.concatenate([x0, h], axis=-1)
        h = jnp.maximum(_trunk_dot(h, w, cdt, st.trunk_3x) + b, 0.0)
    sig_s = jax.nn.softplus(
        _dot(h, heads["sigma_w"], cdt) + heads["sigma_b"]
    ).reshape(R, S)
    xyzf = _dot(h, heads["xyzf_w"], cdt) + heads["xyzf_b"]
    feat = rgb = None
    if st.use_feat:
        feat = _dot(xyzf, heads["feat_w"], cdt) + heads["feat_b"]
    if st.use_rgb:
        pre = _dot(feat, heads["rgb1_w"], cdt).reshape(R, S, -1)
        rgbh = jnp.maximum(pre + ray_cond[:, None, :], 0.0).reshape(R * S, -1)
        rgb = jax.nn.sigmoid(
            _dot(rgbh, heads["rgb2_w"], cdt) + heads["rgb2_b"]
        ).reshape(R, S, 3)
    sig_c = cfeat = None
    if st.use_cand:
        pre1 = _dot(xyzf, heads["c1x_w"], cdt).reshape(R, S, -1)
        ray1 = _dot(c_emb, heads["c1c_w"], cdt) + heads["c1_b"]
        h1 = jnp.maximum(pre1 + ray1[:, None, :], 0.0).reshape(R * S, -1)
        h2 = jnp.maximum(_dot(h1, heads["c2_w"], cdt) + heads["c2_b"], 0.0)
        sig_c = jax.nn.softplus(
            _dot(h2, heads["csig_w"], cdt) + heads["csig_b"]
        ).reshape(R, S)
        cfeat = _dot(h2, heads["cfeat_w"], cdt) + heads["cfeat_b"]

    delta = _deltas(z_vals)
    a_s = 1.0 - jnp.exp(-delta * sig_s)
    shifted = jnp.concatenate([jnp.ones((R, 1)), 1.0 - a_s[:, :-1]], -1)
    ow = a_s * jnp.cumprod(shifted, -1)
    out = {"s_weights": ow, "s_depth": (ow * z_vals).sum(-1)}
    if st.use_rgb:
        out["rgb_map"] = (ow[..., None] * rgb).sum(1)
    if st.use_cand:
        a_c = 1.0 - jnp.exp(-delta * sig_c)
        a_j = 1.0 - jnp.exp(-delta * (sig_s + sig_c))
        shifted_j = jnp.concatenate([jnp.ones((R, 1)), 1.0 - a_j[:, :-1]], -1)
        Tj = jnp.cumprod(shifted_j, -1)
        sw, cw, jw = a_s * Tj, a_c * Tj, a_j * Tj
        out["j_weights"] = jw
        out["c_depth"] = (jw * z_vals).sum(-1)
        out["t_weight"] = cw.sum(-1)
        if st.out_feat:
            out["feat_map"] = (
                sw.reshape(R * S, 1) * feat + cw.reshape(R * S, 1) * cfeat
            ).reshape(R, S, -1).sum(1)
    elif st.out_feat:
        out["feat_map"] = (ow.reshape(R * S, 1) * feat).reshape(R, S, -1).sum(1)
    return out
