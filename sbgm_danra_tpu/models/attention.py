"""Spatial self-attention over flattened H*W tokens.

Re-design of the reference's ImageSelfAttention (sbgm/score_unet.py:112-148):
a pre-LayerNorm transformer block applied to an image feature map whose pixels
are the token axis:

    tokens = reshape(x, [B, H*W, C])
    h = tokens + MHA(LN1(tokens))
    y = h + MLP(LN2(h))          # MLP = Dense(C) -> GELU -> Dense(C)

TPU-first differences from the reference:
- NHWC layout (the reshape to tokens is free — no transpose);
- the attention inner product runs through ``jax.nn.dot_product_attention``
  (XLA flash path) by default, or the Pallas flash kernel in
  ``sbgm_danra_tpu.ops.flash_attention`` for long token counts
  (full-domain 589x789 sampling, SURVEY.md section 5.7);
- computation can run in bfloat16 with float32 LayerNorm/softmax accumulation.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class SpatialSelfAttention(nn.Module):
    """Pre-LN MHA + MLP block on flattened spatial tokens. NHWC in/out."""

    channels: int
    n_heads: int
    # 'xla' (dense flash path) | 'pallas' (in-repo flash kernel, long token
    # counts) | 'ring' (token axis sharded over the ambient
    # parallel.ring_attention.ring_context mesh; exact, dense fallback when no
    # context is active — the pod-scale path for full-domain fields,
    # SURVEY.md section 2.9 SP / reference sbgm/score_unet.py:780)
    backend: str = "xla"
    ring_axis: str = "data"
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        if self.channels % self.n_heads != 0:
            raise ValueError(
                f"channels ({self.channels}) must be divisible by n_heads ({self.n_heads})"
            )
        b, h, w, c = x.shape
        tokens = x.reshape(b, h * w, c)

        # --- attention sublayer (pre-LN, residual) ---
        ln1 = nn.LayerNorm(dtype=jnp.float32, name="ln1")(tokens)
        attn = self._mha(ln1)
        tokens = tokens + attn

        # --- MLP sublayer (pre-LN, residual) ---
        ln2 = nn.LayerNorm(dtype=jnp.float32, name="ln2")(tokens)
        y = nn.Dense(c, dtype=self.compute_dtype, name="ff1")(ln2)
        y = nn.gelu(y)
        y = nn.Dense(c, dtype=self.compute_dtype, name="ff2")(y)
        tokens = tokens + y

        return tokens.reshape(b, h, w, c).astype(x.dtype)

    def _mha(self, tokens: jax.Array) -> jax.Array:
        b, s, c = tokens.shape
        head_dim = c // self.n_heads
        dtype = self.compute_dtype
        # Fused QKV projection: one [C, 3C] matmul keeps the MXU busy instead of
        # three skinny ones.
        qkv = nn.Dense(3 * c, dtype=dtype, name="qkv")(tokens)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, s, self.n_heads, head_dim)
        k = k.reshape(b, s, self.n_heads, head_dim)
        v = v.reshape(b, s, self.n_heads, head_dim)

        if self.backend == "pallas":
            from sbgm_danra_tpu.ops.flash_attention import flash_attention

            out = flash_attention(q, k, v)
        elif self.backend == "ring":
            from sbgm_danra_tpu.parallel.ring_attention import ring_attention_inline

            out = ring_attention_inline(q, k, v, axis_name=self.ring_axis)
        else:
            out = jax.nn.dot_product_attention(q, k, v)

        out = out.reshape(b, s, c)
        return nn.Dense(c, dtype=dtype, name="out_proj")(out)
