"""Integration parity: render_rays through the fused training kernel
(fused_train=True, interpreter mode) vs the plain XLA path — values and
gradients, all phases."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.models import NeRFConfig, init_nerf
from upnerf.ops import pallas_render_train as rt
from upnerf.render import RenderConfig, render_rays

CFG = NeRFConfig(D=2, W=16, skips=(1,), feat_dim=8, xyz_L=2, dir_L=1,
                 appearance_dim=4, candidate_dim=4, c2f=(0.1, 0.5))
RCFG_XLA = RenderConfig(N_samples=12, N_importance=6, perturb=1.0,
                        encode_feat=True, precision="float32",
                        fused_render=False, fused_train=False)
RCFG_FUSED = RCFG_XLA._replace(fused_train=True)

R = 8  # multiple of the ray tile


@pytest.fixture(autouse=True)
def interpret_mode(monkeypatch):
    monkeypatch.setattr(rt, "INTERPRET", True)


def make_params(n_images=3):
    ks = jax.random.split(jax.random.PRNGKey(0), 6)
    return {
        "nerf_coarse": init_nerf(ks[0], CFG),
        "nerf_fine": init_nerf(ks[1], CFG),
        "embeddings": {
            "coarse_a": jax.random.normal(ks[2], (n_images, CFG.appearance_dim)),
            "fine_a": jax.random.normal(ks[3], (n_images, CFG.appearance_dim)),
            "coarse_c": jax.random.normal(ks[4], (n_images, CFG.candidate_dim)),
            "fine_c": jax.random.normal(ks[5], (n_images, CFG.candidate_dim)),
        },
    }


def make_rays():
    ks = jax.random.split(jax.random.PRNGKey(1), 2)
    o = jax.random.normal(ks[0], (R, 3)) * 0.1
    d = jax.random.normal(ks[1], (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays = jnp.concatenate(
        [o, d, jnp.full((R, 1), 0.5), jnp.full((R, 1), 4.0)], -1
    )
    return rays, jnp.array([0, 1, 2, 0, 1, 2, 0, 1])


def _render(cfg, params, rays, idx, phase, encode_candidate=True):
    return render_rays(
        params, cfg, CFG, rays, idx, key=jax.random.PRNGKey(2), phase=phase,
        sched_mult=jnp.asarray({0: 0.0, 1: 0.5, 2: 1.0}[phase]),
        progress=jnp.asarray(0.3), encode_candidate=encode_candidate,
    )


@pytest.mark.parametrize("phase", [0, 1, 2])
def test_values_match_xla(phase):
    params = make_params()
    rays, idx = make_rays()
    a = _render(RCFG_XLA, params, rays, idx, phase)
    b = _render(RCFG_FUSED, params, rays, idx, phase)
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=3e-5, atol=3e-5,
            err_msg=k,
        )


def test_values_match_xla_no_candidate():
    params = make_params()
    rays, idx = make_rays()
    a = _render(RCFG_XLA, params, rays, idx, 1, encode_candidate=False)
    b = _render(RCFG_FUSED, params, rays, idx, 1, encode_candidate=False)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=3e-5, atol=3e-5,
            err_msg=k,
        )


@pytest.mark.parametrize("phase", [0, 1, 2])
def test_grads_match_xla(phase):
    """Training-shaped loss (feat/rgb/depth terms) differentiated through
    both render paths w.r.t. every parameter AND the ray origins (the pose
    gradient path goes through the sample positions)."""
    params = make_params()
    rays, idx = make_rays()

    def loss_fn(cfg):
        def f(p, rays_o):
            r = jnp.concatenate([rays_o, rays[:, 3:]], -1)
            out = _render(cfg, p, r, idx, phase)
            loss = out[f"s_depth_fine"].sum()
            if phase < 2:
                loss = loss + (out["feat_fine"] ** 2).mean()
                loss = loss + (out["feat_coarse"] ** 2).mean()
            if phase > 0:
                loss = loss + (out["s_rgb_fine"] ** 2).mean()
                loss = loss + (out["s_rgb_coarse"] ** 2).mean()
            return loss
        return f

    ga = jax.grad(loss_fn(RCFG_XLA), argnums=(0, 1))(params, rays[:, :3])
    gb = jax.grad(loss_fn(RCFG_FUSED), argnums=(0, 1))(params, rays[:, :3])
    la, ta = jax.tree.flatten(ga)
    lb, tb = jax.tree.flatten(gb)
    assert ta == tb
    for x, y in zip(la, lb):
        scale = max(1e-3, float(jnp.abs(x).max()))
        np.testing.assert_allclose(
            np.asarray(y) / scale, np.asarray(x) / scale, rtol=1e-3,
            atol=1e-4,
        )


def test_det_phase2_routes_through_train_kernel():
    """Forward-only (det) phase-2 renders — the val / TTO-eval path — route
    through the training mega-kernel's forward when fused_train is on
    (render_rays._inference branch order) and match the XLA det path."""
    params = make_params()
    rays, idx = make_rays()

    def det_render(cfg):
        return render_rays(
            params, cfg, CFG, rays, idx, key=None, phase=2,
            sched_mult=jnp.asarray(1.0), progress=jnp.asarray(1.0),
            encode_candidate=False, det=True,
        )

    calls = []
    orig = rt.fused_render_train_rays

    def spy(*a, **k):
        calls.append(1)
        return orig(*a, **k)

    # _fused_train_path imports the symbol inside the function body, so
    # patching the module attribute is enough.
    import unittest.mock as mock

    with mock.patch.object(rt, "fused_render_train_rays", side_effect=spy):
        b = det_render(RCFG_FUSED)
    assert calls, "det phase-2 did not route through the training kernel"
    a = det_render(RCFG_XLA)
    assert set(a) == set(b), (set(a) ^ set(b))
    for k in a:
        np.testing.assert_allclose(
            np.asarray(b[k]), np.asarray(a[k]), rtol=3e-5, atol=3e-5,
            err_msg=k,
        )
