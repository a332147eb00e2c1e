"""Fast serving renders: per-ray interval tightening (upnerf/render/fast.py).

Serving-only sampling acceleration — training/val/TTO parity surfaces are
untouched. Covers the pure tightening math, the sigma-probe plumbing, and
the end-to-end pose-renderer consistency contract (tightening with the
FULL budget and permissive thresholds must reproduce the exact renderer on
a concentrated-density scene)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.models import NeRFConfig, init_nerf
from upnerf.render import FastRenderConfig, RenderConfig, tighten_from_weights
from upnerf.render.fast import tighten_rays


class TestTightenFromWeights:
    def test_brackets_a_spike(self):
        P = 32
        z = jnp.broadcast_to(jnp.linspace(0.5, 5.0, P), (3, P))
        w = jnp.zeros((3, P)).at[:, 10].set(0.9).at[:, 11].set(0.1)
        near = jnp.full((3, 1), 0.5)
        far = jnp.full((3, 1), 5.0)
        z_lo, z_hi = tighten_from_weights(
            z, w, near, far, eps=1e-3, pad=1, min_mass=1e-2
        )
        # the spike bins (and one pad bin each side) survive; most of the
        # empty interval is clipped away
        assert float(z_lo[0, 0]) <= float(z[0, 10]) <= float(z_hi[0, 0])
        assert float(z_lo[0, 0]) >= float(z[0, 8])
        assert float(z_hi[0, 0]) <= float(z[0, 13])
        assert float(z_hi[0, 0] - z_lo[0, 0]) < 0.25 * float(far[0, 0] - near[0, 0])

    def test_empty_ray_falls_back_to_full_interval(self):
        P = 16
        z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, P), (2, P))
        w = jnp.zeros((2, P)).at[1, 5].set(0.5)
        near = jnp.full((2, 1), 1.0)
        far = jnp.full((2, 1), 4.0)
        z_lo, z_hi = tighten_from_weights(
            z, w, near, far, eps=1e-3, pad=1, min_mass=1e-2
        )
        assert float(z_lo[0, 0]) == 1.0 and float(z_hi[0, 0]) == 4.0  # empty ray
        assert float(z_hi[1, 0] - z_lo[1, 0]) < 1.5  # occupied ray tightened

    def test_interval_stays_inside_near_far_and_ordered(self):
        P = 8
        z = jnp.broadcast_to(jnp.linspace(0.1, 5.0, P), (4, P))
        w = jnp.asarray(np.random.RandomState(0).rand(4, P))
        near = jnp.full((4, 1), 0.1)
        far = jnp.full((4, 1), 5.0)
        z_lo, z_hi = tighten_from_weights(
            z, w, near, far, eps=0.05, pad=0, min_mass=1e-3
        )
        assert (np.asarray(z_lo) >= 0.1 - 1e-6).all()
        assert (np.asarray(z_hi) <= 5.0 + 1e-6).all()
        assert (np.asarray(z_hi) > np.asarray(z_lo)).all()


@pytest.fixture(scope="module")
def tiny_model():
    cfg = NeRFConfig(
        D=2, W=32, skips=(1,), feat_dim=8, xyz_L=4, dir_L=2,
        appearance_dim=8, candidate_dim=4, c2f=None,
    )
    params = {
        "nerf_coarse": init_nerf(jax.random.PRNGKey(0), cfg),
        "nerf_fine": init_nerf(jax.random.PRNGKey(1), cfg),
        "embeddings": {
            "coarse_a": jnp.zeros((4, 8)),
            "fine_a": jnp.zeros((4, 8)),
            "coarse_c": jnp.zeros((4, 4)),
            "fine_c": jnp.zeros((4, 4)),
        },
    }
    return cfg, params


def test_tighten_rays_shapes_and_bounds(tiny_model):
    nerf_cfg, params = tiny_model
    rcfg = RenderConfig(N_samples=16, N_importance=8, precision="float32")
    fast = FastRenderConfig(n_probe=16)
    R = 24
    rays = jnp.concatenate(
        [
            jnp.zeros((R, 3)),
            jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (R, 1)),
            jnp.full((R, 1), 0.2),
            jnp.full((R, 1), 4.0),
        ],
        axis=1,
    )
    out = jax.jit(
        lambda r: tighten_rays(
            params["nerf_coarse"], nerf_cfg, rcfg, fast, r, jnp.asarray(1.0)
        )
    )(rays)
    assert out.shape == (R, 8)
    np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(rays[:, :6]))
    assert (np.asarray(out[:, 6]) >= 0.2 - 1e-6).all()
    assert (np.asarray(out[:, 7]) <= 4.0 + 1e-6).all()
    assert (np.asarray(out[:, 7]) > np.asarray(out[:, 6])).all()


def test_pose_renderer_fast_consistency(tiny_model):
    """Contract: with the FULL sample budget and a probe whose thresholds
    keep effectively all mass (min_mass high -> every ray falls back to
    [near, far]), the fast renderer reproduces the exact renderer."""
    from upnerf.evaluate.render import make_pose_renderer, render_image

    nerf_cfg, params = tiny_model
    rcfg = RenderConfig(N_samples=16, N_importance=8, precision="float32")
    # fallback-always probe: tightening is an identity
    fast_id = FastRenderConfig(
        n_probe=8, min_mass=1e9, N_samples=16, N_importance=8
    )
    K = np.array([[30.0, 0, 12.0], [0, 30.0, 10.0], [0, 0, 1]], np.float32)
    pose = np.eye(3, 4, dtype=np.float32)
    wh = (24, 20)
    near_far = np.array([0.2, 4.0], np.float32)

    r_full = make_pose_renderer(nerf_cfg, rcfg, chunk=120)
    r_fast = make_pose_renderer(nerf_cfg, rcfg, chunk=120, fast=fast_id)
    rgb_a, depth_a = render_image(
        r_full, params, K, pose, wh, near_far, 0, chunk=120
    )
    rgb_b, depth_b = render_image(
        r_fast, params, K, pose, wh, near_far, 0, chunk=120
    )
    np.testing.assert_allclose(rgb_a, rgb_b, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(depth_a, depth_b, rtol=1e-5, atol=1e-5)

    # and the REAL fast config still produces finite, in-range maps
    r_fastd = make_pose_renderer(
        nerf_cfg, rcfg, chunk=120,
        fast=FastRenderConfig(n_probe=16, N_samples=8, N_importance=4),
    )
    rgb_c, depth_c = render_image(
        r_fastd, params, K, pose, wh, near_far, 0, chunk=120
    )
    assert np.isfinite(rgb_c).all() and np.isfinite(depth_c).all()
    assert (rgb_c >= 0).all() and (rgb_c <= 1).all()


def test_tighten_last_bin_spike_pad0_keeps_width():
    """Regression: with pad=0 and all probe mass in the LAST bin, the
    clamp must not collapse the interval to zero width at `far` (the
    widening now happens after the clamp, by lowering z_lo)."""
    P = 16
    z = jnp.broadcast_to(jnp.linspace(1.0, 4.0, P), (1, P))
    w = jnp.zeros((1, P)).at[0, P - 1].set(0.8)
    z_lo, z_hi = tighten_from_weights(
        z, w, jnp.full((1, 1), 1.0), jnp.full((1, 1), 4.0),
        eps=1e-3, pad=0, min_mass=1e-2,
    )
    assert float(z_hi[0, 0]) <= 4.0 + 1e-6
    assert float(z_hi[0, 0] - z_lo[0, 0]) >= 5e-5  # f32 rounding
