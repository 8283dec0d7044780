"""Pallas TPU flash attention over spatial tokens.

Memory-linear blockwise attention (online softmax) for the UNet's spatial
self-attention. The reference's dense MHA is O((HW)^2) in memory, which is why
it restricts attention to the two coarsest stages (sbgm/score_unet.py:393-397,
:780); this kernel makes token counts of 10^5+ feasible (full padded DANRA
domain, SURVEY.md §5.7) by never materializing the S x S score matrix.

Layout: q/k/v [B, S, H, D] -> internally [B*H, S, D]. The grid is
(batch*heads, q-blocks); each program streams all K/V blocks through VMEM with
a fori_loop carrying the running max/denominator/accumulator — the standard
flash recipe, tiled to the MXU (block sizes multiple of 128, fp32 accumulation).

Gradients: the op carries a custom VJP whose backward recomputes attention with
XLA's fused kernel and differentiates that — exact gradients, no flash-backward
kernel needed (sampling, the hot path, is forward-only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_BLOCK_Q = 512
DEFAULT_BLOCK_K = 512
_NEG_INF = -1e30


def _attention_kernel(
    q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref, *, s_valid: int, scale: float
):
    """Grid (batch*head, q-blocks, kv-blocks), kv innermost.

    Each program sees one [1, block_q, d] q tile and one [1, block_k, d] K/V
    tile (Pallas streams + double-buffers the HBM->VMEM tile copies); the
    online-softmax state (running max / denominator / accumulator) lives in
    VMEM scratch that persists across the kv-axis iterations. VMEM footprint is
    O(block_q * (block_k + d)) regardless of S — this is what lets the full
    133K-token stride-2 map attend (the dense XLA path simply OOMs there).
    """
    _, block_q, d = q_ref.shape
    block_k = k_ref.shape[1]
    kv_idx = pl.program_id(2)
    num_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * scale
    k = k_ref[0].astype(jnp.float32)
    v = v_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # [block_q, block_k]
    col = kv_idx * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
    s = jnp.where(col < s_valid, s, _NEG_INF)

    m_prev = m_ref[:]
    m_cur = jnp.max(s, axis=-1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    m_ref[:] = m_new
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(kv_idx == num_kv - 1)
    def _finalize():
        o_ref[0] = (acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)).astype(o_ref.dtype)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pallas_flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    block_q: int = DEFAULT_BLOCK_Q,
    block_k: int = DEFAULT_BLOCK_K,
) -> jax.Array:
    """softmax(q k^T / sqrt(D)) v for q/k/v of shape [B, S, H, D]."""
    return _forward(q, k, v, block_q, block_k)


def _forward(q, k, v, block_q, block_k):
    b, s, h, d = q.shape
    scale = 1.0 / (d**0.5)
    block_q = min(block_q, _round_up(s, 128))
    block_k = min(block_k, _round_up(s, 128))
    s_pad = _round_up(s, max(block_q, block_k))
    d_pad = _round_up(d, 128)

    def prep(x):
        x = jnp.swapaxes(x, 1, 2).reshape(b * h, s, d)
        return jnp.pad(x, ((0, 0), (0, s_pad - s), (0, d_pad - d)))

    qf, kf, vf = prep(q), prep(k), prep(v)

    kernel = functools.partial(_attention_kernel, s_valid=s, scale=scale)
    out = pl.pallas_call(
        kernel,
        grid=(b * h, s_pad // block_q, s_pad // block_k),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda i, j, kv: (i, j, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kv: (i, kv, 0)),
            pl.BlockSpec((1, block_k, d_pad), lambda i, j, kv: (i, kv, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda i, j, kv: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, d_pad), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),      # running max
            pltpu.VMEM((block_q, 1), jnp.float32),      # running denominator
            pltpu.VMEM((block_q, d_pad), jnp.float32),  # output accumulator
        ],
        # CPU (tests) runs the kernel in the Pallas interpreter; TPU compiles.
        interpret=jax.default_backend() != "tpu",
    )(qf, kf, vf)

    out = out[:, :s, :d].reshape(b, h, s, d)
    return jnp.swapaxes(out, 1, 2)


def _reference(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


def _fwd(q, k, v, block_q, block_k):
    return _forward(q, k, v, block_q, block_k), (q, k, v)


def _bwd(block_q, block_k, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_reference, q, k, v)
    return vjp(g)


pallas_flash_attention.defvjp(_fwd, _bwd)
