"""Pallas flash attention vs XLA reference (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.ops.pallas_attention import pallas_flash_attention


def _qkv(b=2, s=300, h=2, d=32, seed=0):
    rng = jax.random.PRNGKey(seed)
    kq, kk, kv = jax.random.split(rng, 3)
    shape = (b, s, h, d)
    return (
        jax.random.normal(kq, shape, jnp.float32),
        jax.random.normal(kk, shape, jnp.float32),
        jax.random.normal(kv, shape, jnp.float32),
    )


class TestFlashAttention:
    @pytest.mark.parametrize("s", [128, 300, 512, 1000])
    def test_matches_xla_reference(self, s):
        q, k, v = _qkv(s=s)
        got = pallas_flash_attention(q, k, v, 256, 256)
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_head_dim_not_128(self):
        # d=24 exercises the lane-padding path
        q, k, v = _qkv(s=200, d=24)
        got = pallas_flash_attention(q, k, v, 128, 128)
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)

    def test_gradients_match(self):
        q, k, v = _qkv(s=160, d=16)

        def f_pallas(q, k, v):
            return jnp.sum(pallas_flash_attention(q, k, v, 128, 128) ** 2)

        def f_ref(q, k, v):
            return jnp.sum(jax.nn.dot_product_attention(q, k, v) ** 2)

        g1 = jax.grad(f_pallas, argnums=(0, 1, 2))(q, k, v)
        g2 = jax.grad(f_ref, argnums=(0, 1, 2))(q, k, v)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5, rtol=5e-5)

    def test_flash_wrapper_dispatch(self):
        from sbgm_danra_tpu.ops.flash_attention import flash_attention

        q, k, v = _qkv(s=64)
        out = flash_attention(q, k, v)  # CPU, small -> XLA path
        want = jax.nn.dot_product_attention(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-6)

    def test_model_with_pallas_backend(self):
        """Whole UNet forward with attention_backend='pallas' (interpreted)."""
        from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
        from sbgm_danra_tpu.ops import flash_attention as fa

        old = fa._FORCE_PALLAS
        fa._FORCE_PALLAS = True
        try:
            spec = ModelSpec(
                in_channels=1, time_embedding=32, last_fmap_channels=64,
                num_heads=2, block_layers=(1, 1, 1, 1), num_classes=None,
                attention_backend="pallas",
            )
            model = build_score_model(spec)
            x = jnp.ones((1, 32, 32, 1))
            t = jnp.full((1,), 0.5)
            cond = jnp.ones((1, 32, 32, 1))
            variables = model.init(
                {"params": jax.random.PRNGKey(0)}, x, t, cond_img=cond, train=False
            )
            out = model.apply(variables, x, t, cond_img=cond, train=False)
            assert out.shape == (1, 32, 32, 1)
            assert np.isfinite(np.asarray(out)).all()
        finally:
            fa._FORCE_PALLAS = old
