"""Blockwise (flash) self-attention for spatial tokens.

The reference copes with O((HW)^2) dense attention by restricting it to the two
coarsest UNet stages (sbgm/score_unet.py:393-397, :780). A memory-linear flash
kernel lifts that restriction on TPU: attention over the full padded DANRA
domain (608x800 -> ~122K tokens at stride 2) becomes feasible (SURVEY.md §5.7).

``flash_attention`` dispatches to a Pallas TPU kernel when running on TPU and
the token count is large enough to amortize it; otherwise it falls back to
``jax.nn.dot_product_attention`` (XLA already emits a fused flash-style kernel
for moderate sizes). The Pallas path lives in ``_pallas_flash`` below.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array

# Minimum token count before the custom kernel pays for itself; below this XLA's
# fused attention is at least as good and compiles faster.
_MIN_TOKENS_FOR_PALLAS = 4096

# Test hook: force the Pallas path regardless of platform/size (interpreter on CPU).
_FORCE_PALLAS = False


def flash_attention(q: Array, k: Array, v: Array) -> Array:
    """Self-attention over [B, S, H, D] q/k/v; returns [B, S, H, D].

    Numerics match jax.nn.dot_product_attention (softmax(q k^T / sqrt(D)) v).
    """
    s = q.shape[1]
    on_tpu = jax.default_backend() == "tpu"
    if _FORCE_PALLAS or (on_tpu and s >= _MIN_TOKENS_FOR_PALLAS):
        from sbgm_danra_tpu.ops.pallas_attention import pallas_flash_attention

        return pallas_flash_attention(q, k, v)
    return jax.nn.dot_product_attention(q, k, v)
