"""Exactness of the fused decoder head (ops/fused_head.py) vs the unfused
upsample -> conv3x3 -> conv3x3 chain it replaces (models/unet.py final block,
re-designing the reference's stripped last block sbgm/score_unet.py:713-730)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.ops.fused_head import _unfused, fused_head


def _rand(rng, shape):
    return jnp.asarray(rng.normal(size=shape).astype(np.float32))


@pytest.mark.parametrize(
    "h,w,c,co",
    [(16, 16, 8, 1), (12, 20, 16, 3), (64, 64, 8, 1)],
)
def test_fused_head_matches_unfused(h, w, c, co):
    rng = np.random.default_rng(0)
    x = _rand(rng, (2, h, w, c))
    k_up = _rand(rng, (3, 3, c, c)) / np.sqrt(9 * c)
    b_up = _rand(rng, (c,))
    k_f = _rand(rng, (3, 3, c, co)) / np.sqrt(9 * c)
    b_f = _rand(rng, (co,))
    want = _unfused(x, k_up, b_up, k_f, b_f)
    got = fused_head(x, k_up, b_up, k_f, b_f)
    assert got.shape == (2, 2 * h, 2 * w, co)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5, rtol=2e-5)


def test_fused_head_small_input_fallback():
    rng = np.random.default_rng(1)
    x = _rand(rng, (1, 8, 8, 4))
    k_up = _rand(rng, (3, 3, 4, 4))
    b_up = _rand(rng, (4,))
    k_f = _rand(rng, (3, 3, 4, 2))
    b_f = _rand(rng, (2,))
    got = fused_head(x, k_up, b_up, k_f, b_f)
    want = _unfused(x, k_up, b_up, k_f, b_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)


def test_fused_head_jits():
    rng = np.random.default_rng(2)
    x = _rand(rng, (1, 16, 16, 8))
    k_up = _rand(rng, (3, 3, 8, 8)) / np.sqrt(72)
    b_up = _rand(rng, (8,))
    k_f = _rand(rng, (3, 3, 8, 1)) / np.sqrt(72)
    b_f = _rand(rng, (1,))
    got = jax.jit(fused_head)(x, k_up, b_up, k_f, b_f)
    want = _unfused(x, k_up, b_up, k_f, b_f)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5, rtol=1e-5)
