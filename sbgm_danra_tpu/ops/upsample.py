"""Gather-free 2x bilinear upsampling as a depthwise fractionally-strided conv.

``jax.image.resize(..., method="bilinear")`` lowers to gather/weighted-sum HLO;
expressing the fixed 2x upsample as a dense depthwise conv gives the compiler
a fusable convolution instead (measured: parity with XLA's resize lowering on
TPU v5e at the full-model level, with the conv form friendlier to fusion with
the following 3x3 conv). The exact same map is a depthwise conv with the
4-tap kernel [1/4, 3/4, 3/4, 1/4] on the 2x-dilated, edge-replicated input:

    out[2i]   = 1/4 x[i-1] + 3/4 x[i]
    out[2i+1] = 3/4 x[i]   + 1/4 x[i+1]      (edges clamped)

which is precisely half-pixel-center bilinear interpolation. Exactness against
``jax.image.resize`` is pinned by tests/test_data.py::TestUpsample2x.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

_TAPS = (0.25, 0.75, 0.75, 0.25)


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """NHWC -> N(2H)(2W)C, bit-equivalent to bilinear jax.image.resize 2x."""
    n, h, w, c = x.shape
    k1 = jnp.asarray(_TAPS, x.dtype)
    kernel = jnp.outer(k1, k1)  # (4, 4)
    # depthwise: HWIO with I=1, feature_group_count=C
    kernel = jnp.tile(kernel[:, :, None, None], (1, 1, 1, c))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # dilated size 2(H+2)-1 = 2H+3; VALID with k=4 -> 2H exactly
    return lax.conv_general_dilated(
        xp,
        kernel,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
