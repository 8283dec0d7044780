"""Space-to-depth decomposition of the encoder's 8x8/stride-2 stem convs.

The reference encoder opens with two Conv2d(k=8, s=2, p=3, bias=False) stems
(sbgm/score_unet.py:206-219). Large-kernel strided convolutions are the worst
shape for the TPU convolution emitter — measured on v5e, the two stems alone
account for most of the encoder's time at ~170 GB/s effective bandwidth
(scripts/perf_probe.py parts).

An 8x8 stride-2 conv is algebraically a 4x4 stride-1 conv on the 2x2
space-to-depth transform of the (zero-padded) input:

    out[i] = sum_k K[k] xp[2i + k]                 (xp = pad(x, 3); k = 2a + b)
           = sum_b sum_a K[2a+b] phase_b[i + a]    (phase_b[j] = xp[2j + b])

so with xs = S2D_2(pad(x, 3)) of shape (B, H/2+3, W/2+3, 4C) and the kernel
rearranged to (4, 4, 4C, Cout), the stem is one dense stride-1 VALID conv —
a bread-and-butter MXU shape with no strided access and a 4x deeper
contraction. Exactness vs the direct form is pinned by tests/test_stem_conv.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jax.Array


def conv8x8s2_direct(x: Array, kernel: Array) -> Array:
    """Reference lowering: one strided conv with torch geometry (k=8, s=2, p=3)."""
    return lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(2, 2),
        padding=((3, 3), (3, 3)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def conv8x8s2_s2d(x: Array, kernel: Array) -> Array:
    """Same map via space-to-depth: (B,H,W,C) -> (B,H/2,W/2,Cout), H and W even.

    kernel: (8, 8, Cin, Cout) in HWIO, identical layout to the direct form.
    """
    b, h, w, c = x.shape
    if h % 2 or w % 2:
        return conv8x8s2_direct(x, kernel)  # odd sizes: rare, keep the exact path
    o = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    h2, w2 = (h + 6) // 2, (w + 6) // 2
    xs = (
        xp.reshape(b, h2, 2, w2, 2, c)
        .transpose(0, 1, 3, 2, 4, 5)
        .reshape(b, h2, w2, 4 * c)
    )
    # K8[2a_h + b_h, 2a_w + b_w, c, o] -> K4[a_h, a_w, (b_h, b_w, c), o]
    k = (
        kernel.reshape(4, 2, 4, 2, c, o)
        .transpose(0, 2, 1, 3, 4, 5)
        .reshape(4, 4, 4 * c, o)
    )
    return lax.conv_general_dilated(
        xs,
        k,
        window_strides=(1, 1),
        padding=((0, 0), (0, 0)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
