"""Fused Pallas trunk kernel vs the XLA reference (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.ops import pallas_mlp


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_mlp.INTERPRET = True
    yield
    pallas_mlp.INTERPRET = False


def make_params(D=4, W=32, in0=24, skips=(2,), seed=0):
    ks = iter(jax.random.split(jax.random.PRNGKey(seed), 2 * D + 2))
    return tuple(
        (
            jax.random.normal(
                next(ks), (pallas_mlp._layer_in_dim(i, in0, W, skips), W)
            )
            * 0.1,
            jax.random.normal(next(ks), (W,)) * 0.1,
        )
        for i in range(D)
    )


class TestFusedTrunk:
    def test_forward_matches_xla(self):
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 24))
        ref = pallas_mlp.reference_trunk(x, params, skips)
        out = pallas_mlp.fused_trunk(x, params, skips, 32, "float32")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gradients_match_xla(self):
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 24))

        gk = jax.grad(
            lambda x, p: (pallas_mlp.fused_trunk(x, p, skips, 32, "float32") ** 2).sum(),
            argnums=(0, 1),
        )(x, params)
        gr = jax.grad(
            lambda x, p: (pallas_mlp.reference_trunk(x, p, skips) ** 2).sum(),
            argnums=(0, 1),
        )(x, params)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)

    def test_no_skip_config(self):
        skips = ()
        params = make_params(D=3, skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 24))
        ref = pallas_mlp.reference_trunk(x, params, skips)
        out = pallas_mlp.fused_trunk(x, params, skips, 32, "float32")
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_multi_tile_grad_accumulation(self):
        # dW must accumulate across sequential grid steps
        skips = (2,)
        params = make_params(skips=skips)
        x = jax.random.normal(jax.random.PRNGKey(3), (128, 24))
        gk = jax.grad(
            lambda p: (pallas_mlp.fused_trunk(x, p, skips, 32, "float32")).sum()
        )(params)
        gr = jax.grad(
            lambda p: (pallas_mlp.reference_trunk(x, p, skips)).sum()
        )(params)
        for a, b in zip(jax.tree.leaves(gk), jax.tree.leaves(gr)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-4
            )
