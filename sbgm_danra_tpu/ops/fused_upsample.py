"""Fused 2x-bilinear-upsample + 3x3 conv as ONE convolution.

The decoder's hot chain (models/unet.py DecoderBlock, re-designing the
reference's resize-conv upsample, sbgm/score_unet.py:465-475) is

    up = upsample2x_bilinear(x)          # (B, 2H, 2W, C) intermediate
    y  = conv3x3(up) + bias              # zero-padded SAME conv

Both ops are linear, so they compose into a single fractionally-strided
convolution: the 4-tap bilinear kernel K4 = outer([1/4,3/4,3/4,1/4]) convolved
with the learned 3x3 kernel gives a 6x6 kernel applied to the 2x-dilated,
edge-replicated input. Fusing removes the (2H, 2W, C) intermediate write+read
from HBM — at the decoder's finest stage that intermediate is the largest
activation of the whole network (DESIGN.md section 4a roofline).

Two equivalent lowerings are provided (same math, different XLA paths):

- ``fused_upsample_conv_dilated``: one ``lax.conv_general_dilated`` with
  ``lhs_dilation=(2, 2)`` and the 6x6 composite kernel.
- ``fused_upsample_conv_phases``: the polyphase decomposition — four 3x3
  convs on the COARSE grid (one per output subpixel phase) interleaved into
  the fine grid. Identical FLOPs to the unfused conv; zero multiply-by-zero
  waste regardless of how the backend handles input dilation.

Derivation (1-D, cross-correlation convention as used by flax/lax):
with xp = edge-pad(x, 1), d = 2x-dilate(xp) and the unfused chain
``y = corr(zero-pad(corr_valid(d, K4), 1), K3)``, collecting terms gives
``y[m] = sum_r Kc[r] d[m-1+r]`` where ``Kc = conv(K3, K4)`` (full, length 6),
i.e. ``corr(d, Kc)`` with padding (1, 1) applied after dilation — EXCEPT at
the outermost output ring: the 3x3 conv zero-pads the upsampled intermediate,
but the composite form instead reads "ghost" bilinear extensions of it (for
2x bilinear with taps [1/4, 3/4, 3/4, 1/4] the ghost value one step outside
the grid is exactly the nearest input pixel). The fused forms therefore
subtract the ghost-row/column contributions from the border outputs
(O(H + W) work, inclusion–exclusion at the four corners). Exactness against
the unfused chain is pinned by tests/test_fused_upsample.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from sbgm_danra_tpu.ops.upsample import _TAPS

Array = jax.Array


def composite_kernel(kernel3: Array) -> Array:
    """(3, 3, Cin, Cout) learned kernel -> (6, 6, Cin, Cout) composite with the
    bilinear 4x4 tap kernel: Kc[kh+qh, kw+qw] += K3[qh, qw] * K4[kh, kw]."""
    taps = jnp.asarray(_TAPS, kernel3.dtype)
    k4 = jnp.outer(taps, taps)  # (4, 4)
    kh3, kw3, cin, cout = kernel3.shape
    if (kh3, kw3) != (3, 3):
        raise ValueError(f"expected a 3x3 kernel, got {kernel3.shape}")
    kc = jnp.zeros((6, 6, cin, cout), kernel3.dtype)
    for kh in range(4):
        for kw in range(4):
            kc = kc.at[kh : kh + 3, kw : kw + 3].add(kernel3 * k4[kh, kw])
    return kc


def _upsample1d_ghosted(r: Array) -> Array:
    """1-D bilinear 2x upsample of (B, L, C) rows, extended by one ghost value
    on each side (the bilinear extension one step outside the grid is the
    nearest input sample). Returns (B, 2L + 2, C)."""
    taps = jnp.asarray(_TAPS, r.dtype)
    rp = jnp.pad(r, ((0, 0), (1, 1), (0, 0)), mode="edge")  # (B, L+2, C)
    c = r.shape[-1]
    k = jnp.tile(taps[:, None, None], (1, 1, c))  # (4, 1, C) depthwise
    u = lax.conv_general_dilated(
        rp,
        k,
        window_strides=(1,),
        padding=((0, 0),),
        lhs_dilation=(2,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        feature_group_count=c,
    )  # (B, 2L, C)
    return jnp.concatenate([r[:, :1], u, r[:, -1:]], axis=1)


def _border_corrections(x: Array, kernel3: Array):
    """Contributions the composite form wrongly reads from ghost rows/columns
    of the upsampled intermediate; to be SUBTRACTED from the border outputs.

    Returns (top, bottom, left, right) with shapes (B, 2W, Cout) / (B, 2H, Cout);
    corner ghost terms are removed once from each of the two overlapping edge
    corrections (inclusion–exclusion).
    """

    def edge_term(row: Array, k1: Array) -> Array:
        # row: (B, L, Cin) input edge; k1: (3, Cin, Cout) one kernel row/col.
        g = _upsample1d_ghosted(row)  # (B, 2L+2, Cin), ghosts = corner pixels
        return lax.conv_general_dilated(
            g, k1, window_strides=(1,), padding=((0, 0),),
            dimension_numbers=("NHC", "HIO", "NHC"),
        )  # (B, 2L, Cout)

    top = edge_term(x[:, 0, :, :], kernel3[0])       # ghost row above
    bottom = edge_term(x[:, -1, :, :], kernel3[2])   # ghost row below
    left = edge_term(x[:, :, 0, :], kernel3[:, 0])   # ghost column left
    right = edge_term(x[:, :, -1, :], kernel3[:, 2])

    # Corner ghosts (up_ext[-1,-1] = x[0,0], etc.) appear in BOTH the top/bottom
    # and left/right corrections; keep each only once by removing it from the
    # left/right terms.
    def corner(px: Array, k: Array) -> Array:  # px: (B, Cin); k: (Cin, Cout)
        return px @ k

    left = left.at[:, 0].add(-corner(x[:, 0, 0], kernel3[0, 0]))
    left = left.at[:, -1].add(-corner(x[:, -1, 0], kernel3[2, 0]))
    right = right.at[:, 0].add(-corner(x[:, 0, -1], kernel3[0, 2]))
    right = right.at[:, -1].add(-corner(x[:, -1, -1], kernel3[2, 2]))
    return top, bottom, left, right


def _apply_border(y: Array, x: Array, kernel3: Array) -> Array:
    top, bottom, left, right = _border_corrections(x, kernel3.astype(y.dtype))
    y = y.at[:, 0, :, :].add(-top)
    y = y.at[:, -1, :, :].add(-bottom)
    y = y.at[:, :, 0, :].add(-left)
    y = y.at[:, :, -1, :].add(-right)
    return y


def fused_upsample_conv_dilated(x: Array, kernel3: Array, bias: Array | None = None) -> Array:
    """NHWC (B,H,W,Cin) -> (B,2H,2W,Cout): bilinear-2x-upsample then SAME 3x3
    conv, as one lhs-dilated convolution (+ O(H+W) border correction)."""
    kc = composite_kernel(kernel3)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    y = lax.conv_general_dilated(
        xp,
        kc,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = _apply_border(y, x.astype(y.dtype), kernel3)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y


def fused_upsample_conv_phases(x: Array, kernel3: Array, bias: Array | None = None) -> Array:
    """Same map as ``fused_upsample_conv_dilated`` via the polyphase form.

    Output phase (a, b) in {0,1}^2 at coarse position (i, j) reads composite
    taps Kc[r] with r = 2u + 1 - a (u = 0..2), i.e. rows [1,3,5] for a=0 and
    [0,2,4] for a=1 — four 3x3 convs over the edge-padded coarse grid,
    interleaved into the fine grid.
    """
    kc = composite_kernel(kernel3)  # (6, 6, Cin, Cout)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")
    b, hp, wp, _ = xp.shape
    h, w = x.shape[1], x.shape[2]
    cout = kc.shape[-1]
    rows = {0: (1, 3, 5), 1: (0, 2, 4)}
    phases = []
    for a in (0, 1):
        row_k = kc[jnp.array(rows[a]), :, :, :]
        for bb in (0, 1):
            k = row_k[:, jnp.array(rows[bb]), :, :]  # (3, 3, Cin, Cout)
            p = lax.conv_general_dilated(
                xp,
                k,
                window_strides=(1, 1),
                padding=((0, 0), (0, 0)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )  # (B, H, W, Cout): VALID 3x3 on H+2 -> H
            phases.append(p)
    # interleave: y[:, 2i+a, 2j+b] = phases[2a+b][:, i, j]
    stack = jnp.stack(phases, axis=0).reshape(2, 2, b, h, w, cout)
    y = jnp.transpose(stack, (2, 3, 0, 4, 1, 5)).reshape(b, 2 * h, 2 * w, cout)
    y = _apply_border(y, x.astype(y.dtype), kernel3)
    if bias is not None:
        y = y + bias.astype(y.dtype)
    return y
