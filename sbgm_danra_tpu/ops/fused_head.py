"""Fused decoder head: upsample2x -> conv3x3 -> conv3x3 as ONE convolution.

The decoder's final block (models/unet.py Decoder 'final', re-designing the
reference's stripped last block, sbgm/score_unet.py:713-730) is entirely
linear: no norm, identity activation, no skip, no time-add. Its chain

    x1  = upsample2x_bilinear(x)        # (B, 2H, 2W, C)   54.5 MB logical
    x2  = conv3x3_same(x1, K_up) + b_up # (B, 2H, 2W, C)   54.5 MB logical
    out = conv3x3_same(x2, K_f) + b_f   # (B, 2H, 2W, Cout)

materializes two (2H, 2W, C) intermediates. On TPU the activation layout
tiles channels to 128 lanes and the batch to 32 sublanes, so at the flagship's
C=64 / B=26 those intermediates cost ~2.5x their logical bytes in real HBM
traffic — measured, this chain is ~0.6 ms of the 3.36 ms guided forward
(scripts/perf_probe.py parts; docs/DESIGN.md section 4a).

All three ops are linear, so they compose exactly: on the interior the chain
is a single 8-tap fractionally-strided convolution of the edge-padded input
with the composite kernel B = K4 * K_up * K_f (full convolution of the
correlation kernels; K4 = bilinear taps [1/4, 3/4, 3/4, 1/4] outer-squared),
plus the constant bias b_f + sum(K_f) . b_up. Border rows/columns see three
different edge semantics (bilinear edge replication, then two zero-pad SAME
convs), so the fused op recomputes thin border slabs with the exact unfused
chain and overwrites the outer 4-pixel ring — O(H + W) work.

Exactness vs the unfused chain is pinned by tests/test_fused_head.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sbgm_danra_tpu.ops.upsample import _TAPS, upsample2x_bilinear

Array = jax.Array

_STRIP = 4  # fine-grid border width recomputed exactly
_SLAB = 6  # coarse-grid slab rows/cols needed to compute a clean strip


def _conv3_same(x: Array, k: Array, b: Array | None) -> Array:
    y = lax.conv_general_dilated(
        x, k, (1, 1), ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC")
    )
    return y if b is None else y + b.astype(y.dtype)


def _full_conv_kernels(a: Array, b: Array) -> Array:
    """Composite of two correlation kernels: applying ``a`` (ka taps) then ``b``
    (kb taps) equals one correlation with the (ka + kb - 1)-tap kernel
    C[r] = sum_{p+q=r} a[p] b[q], channels contracted (a: HWIO i->m, b: HWIO
    m->o). Kernel sizes are static and tiny, so plain Python loops."""
    ah, aw, ci, cm = a.shape
    bh, bw, cm2, co = b.shape
    assert cm == cm2
    out = jnp.zeros((ah + bh - 1, aw + bw - 1, ci, co), a.dtype)
    for p in range(ah):
        for q in range(bh):
            for s in range(aw):
                for t in range(bw):
                    out = out.at[p + q, s + t].add(
                        jnp.einsum("im,mo->io", a[p, s], b[q, t])
                    )
    return out


def _composite_kernel(k_up: Array, k_f: Array) -> Array:
    """(3,3,C,C) and (3,3,C,Co) -> the 8-tap fine-grid kernel over the
    2x-dilated edge-padded input: B = K4_depthwise * (K_up * K_f)."""
    a = _full_conv_kernels(k_up, k_f)  # (5, 5, C, Co)
    taps = jnp.asarray(_TAPS, a.dtype)
    k4 = jnp.outer(taps, taps)  # (4, 4)
    h, w, ci, co = a.shape
    out = jnp.zeros((h + 3, w + 3, ci, co), a.dtype)
    for p in range(4):
        for q in range(4):
            out = out.at[p : p + h, q : q + w].add(a * k4[p, q])
    return out  # (8, 8, C, Co)


def _unfused(x: Array, k_up: Array, b_up: Array, k_f: Array, b_f: Array) -> Array:
    return _conv3_same(_conv3_same(upsample2x_bilinear(x), k_up, b_up), k_f, b_f)


def fused_head(x: Array, k_up: Array, b_up: Array, k_f: Array, b_f: Array) -> Array:
    """(B,H,W,C) -> (B,2H,2W,Cout), exactly upsample2x -> conv(K_up) -> conv(K_f).

    Kernels in HWIO: k_up (3,3,C,C), k_f (3,3,C,Cout); biases (C,), (Cout,).
    """
    bsz, h, w, c = x.shape
    if h < 2 * _SLAB or w < 2 * _SLAB:
        return _unfused(x, k_up, b_up, k_f, b_f)

    kc = _composite_kernel(k_up.astype(x.dtype), k_f.astype(x.dtype))
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    # out[n] = sum_r B[r] d[n - 2 + r] with d = 2x-dilated xp: padding (2, 2)
    # on the dilated grid gives length 2(H+2)-1 + 4 - 8 + 1 = 2H.
    y = lax.conv_general_dilated(
        xp,
        kc,
        window_strides=(1, 1),
        padding=((2, 2), (2, 2)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # interior constant bias: b_f + sum over K_f taps of b_up
    bconst = b_f.astype(y.dtype) + jnp.einsum(
        "hwco->o", k_f.astype(y.dtype) * b_up.astype(y.dtype)[None, None, :, None]
    )
    y = y + bconst

    # exact border strips (full-width rows, full-height columns)
    s, m = _STRIP, _SLAB
    args = (k_up.astype(x.dtype), b_up, k_f.astype(x.dtype), b_f)
    top = _unfused(x[:, :m], *args)[:, :s]
    bot = _unfused(x[:, -m:], *args)[:, -s:]
    left = _unfused(x[:, :, :m], *args)[:, :, :s]
    right = _unfused(x[:, :, -m:], *args)[:, :, -s:]
    y = y.at[:, :s].set(top)
    y = y.at[:, -s:].set(bot)
    y = y.at[:, :, :s].set(left)
    y = y.at[:, :, -s:].set(right)
    return y
