"""Exactness of the fused upsample+conv against the unfused decoder chain."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.ops.fused_upsample import (
    fused_upsample_conv_dilated,
    fused_upsample_conv_phases,
)
from sbgm_danra_tpu.ops.upsample import upsample2x_bilinear


def _unfused(x, kernel3, bias):
    """The decoder's current chain: bilinear 2x then zero-padded SAME 3x3 conv
    (models/unet.py DecoderBlock upsample + conv_up)."""
    up = upsample2x_bilinear(x)
    y = jax.lax.conv_general_dilated(
        up,
        kernel3,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias


@pytest.mark.parametrize("fused", [fused_upsample_conv_dilated, fused_upsample_conv_phases])
@pytest.mark.parametrize("shape", [(2, 5, 7, 3, 4), (1, 8, 8, 6, 6)])
def test_fused_matches_unfused(fused, shape):
    b, h, w, cin, cout = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, h, w, cin)).astype(np.float32))
    k3 = jnp.asarray(rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2)
    bias = jnp.asarray(rng.normal(size=(cout,)).astype(np.float32))
    ref = _unfused(x, k3, bias)
    got = fused(x, k3, bias)
    assert got.shape == (b, 2 * h, 2 * w, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_fused_bf16_close():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 6, 8)).astype(np.float32)).astype(jnp.bfloat16)
    k3 = jnp.asarray((rng.normal(size=(3, 3, 8, 8)) * 0.2).astype(np.float32)).astype(jnp.bfloat16)
    bias = jnp.zeros((8,), jnp.bfloat16)
    ref = _unfused(x, k3, bias).astype(jnp.float32)
    got = fused_upsample_conv_dilated(x, k3, bias).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=0.05, atol=0.05)
