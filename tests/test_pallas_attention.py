"""Flash-attention kernel vs dense XLA attention (interpreter on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from upnerf.features import vit
from upnerf.ops import pallas_attention


@pytest.fixture(autouse=True)
def interpret_mode():
    pallas_attention.INTERPRET = True
    yield
    pallas_attention.INTERPRET = False


def dense_attn(q, k, v, scale):
    s = jax.nn.softmax(
        jnp.einsum("gnd,gmd->gnm", q, k) * scale, -1
    )
    return jnp.einsum("gnm,gmd->gnd", s, v)


def make_qkv(G=3, N=300, hd=64, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 3)
    shape = (G, N, hd)
    return tuple(jax.random.normal(k, shape) for k in ks)


class TestFlashAttention:
    def test_f32_matches_dense(self):
        # N=300 is NOT a block multiple: exercises both query- and
        # key-side padding/masking.
        q, k, v = make_qkv()
        scale = 1.0 / np.sqrt(64)
        got = pallas_attention.flash_attention(
            q, k, v, scale=scale, block_q=128, block_k=128,
            compute_dtype=jnp.float32,
        )
        want = dense_attn(q, k, v, scale)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_multiple_kv_blocks_exact_block_fit(self):
        q, k, v = make_qkv(G=2, N=256, seed=3)
        scale = 0.125
        got = pallas_attention.flash_attention(
            q, k, v, scale=scale, block_q=64, block_k=64,
            compute_dtype=jnp.float32,
        )
        want = dense_attn(q, k, v, scale)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_bf16_close_to_dense(self):
        q, k, v = make_qkv(seed=7)
        scale = 1.0 / np.sqrt(64)
        got = pallas_attention.flash_attention(
            q, k, v, scale=scale, block_q=128, block_k=128,
            compute_dtype=jnp.bfloat16,
        )
        want = dense_attn(q, k, v, scale)
        np.testing.assert_allclose(got, want, rtol=0.05, atol=0.02)

    def test_large_scale_softmax_stability(self):
        # Big logits: online max-subtraction must not overflow.
        q, k, v = make_qkv(G=1, N=160, seed=11)
        got = pallas_attention.flash_attention(
            20.0 * q, k, v, scale=1.0, block_q=64, block_k=64,
            compute_dtype=jnp.float32,
        )
        want = dense_attn(20.0 * q, k, v, 1.0)
        assert np.isfinite(np.asarray(got)).all()
        # online (two-pass-free) softmax reassociates the exp sums; at
        # |logit|~25 that costs a few ulps more than the well-scaled case
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=2e-4)


class TestViTWiring:
    def test_flash_impl_matches_dense_impl(self):
        cfg = vit.ViTConfig(patch_size=8, dim=96, depth=2, heads=6,
                            base_grid=4)
        params = vit.init_vit_params(jax.random.PRNGKey(0), cfg)
        img = jax.random.normal(jax.random.PRNGKey(1), (64, 64, 3))
        out_d = vit.forward_features(
            params, cfg._replace(attn_impl="dense"), img, stride=8,
            key_layer=1,
        )
        out_f = vit.forward_features(
            params, cfg._replace(attn_impl="flash"), img, stride=8,
            key_layer=1,
        )
        np.testing.assert_allclose(
            out_f["tokens"], out_d["tokens"], rtol=2e-2, atol=2e-2
        )
        # the key facet bypasses the attention core entirely
        np.testing.assert_allclose(
            out_f["keys"], out_d["keys"], rtol=2e-2, atol=2e-2
        )

    def test_auto_resolution(self):
        small = vit._resolve_attn_impl("auto", 100)
        assert small == "dense"
        big = vit._resolve_attn_impl("auto", 12322)
        assert big in ("flash", "chunked")  # flash iff on TPU
        assert vit._resolve_attn_impl("chunked", 12322) == "chunked"
