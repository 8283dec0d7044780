"""Time-step embeddings.

Gaussian random-Fourier features with fixed (non-trainable) frequencies, matching
the reference's SinusoidalEmbedding (sbgm/score_unet.py:24-45): frequencies
W ~ N(0, scale^2) are drawn once at init and kept constant; the embedding is
[sin(2*pi*t*W), cos(2*pi*t*W)].

The frequencies live in the ``buffers`` variable collection so they checkpoint
with the model but are never passed to the optimizer — the JAX analogue of a
registered torch buffer.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


class GaussianFourierEmbedding(nn.Module):
    """Random Fourier features of scalar time steps.

    Input: t of shape [B] (float); output: [B, embed_dim].
    """

    embed_dim: int
    scale: float = 30.0

    @nn.compact
    def __call__(self, t: jax.Array) -> jax.Array:
        if self.embed_dim % 2 != 0:
            raise ValueError(f"Embedding dimension must be even, got {self.embed_dim}.")
        w = self.variable(
            "buffers",
            "W",
            lambda: self.scale
            * jax.random.normal(self.make_rng("params"), (self.embed_dim // 2,), jnp.float32),
        ).value
        t = t.reshape(-1).astype(jnp.float32)
        proj = t[:, None] * w[None, :] * (2.0 * jnp.pi)
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)
