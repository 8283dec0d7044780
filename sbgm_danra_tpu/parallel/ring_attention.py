"""Ring attention: exact self-attention with the token axis sharded over a mesh.

The long-context analogue for 2-D fields (SURVEY.md §5.7): at pod scale the
flattened spatial token axis of a full-domain feature map is sharded across
devices; each device holds its q/k/v shard and K/V blocks rotate around the
ring (``lax.ppermute`` over ICI) while an online softmax accumulates — exact
attention, O(S/n) memory per device, communication overlapped with the block
matmuls by XLA.

Composes with the Pallas flash kernel: each device's local block-block product
can itself be the flash kernel; here the block product is plain dot_general
(already MXU-shaped), which XLA fuses well at per-device block sizes.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

_NEG_INF = -1e30


def _ring_attention_local(q: Array, k: Array, v: Array, axis_name: str) -> Array:
    """Per-device body under shard_map. q/k/v: [B, S_local, H, D]."""
    n = jax.lax.psum(1, axis_name)
    b, s_loc, h, d = q.shape
    scale = 1.0 / (d**0.5)
    # [B, H, S_local, D] for batched matmuls
    qt = jnp.swapaxes(q, 1, 2).astype(jnp.float32) * scale

    perm = [(i, (i + 1) % n) for i in range(n)]

    def step(carry, _):
        m, l, acc, k_blk, v_blk = carry
        kt = jnp.swapaxes(k_blk, 1, 2).astype(jnp.float32)
        vt = jnp.swapaxes(v_blk, 1, 2).astype(jnp.float32)
        s = jnp.einsum("bhqd,bhkd->bhqk", qt, kt)
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m, m_cur)
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jnp.einsum("bhqk,bhkd->bhqd", p, vt)
        # rotate K/V shards one hop around the ring
        k_next = jax.lax.ppermute(k_blk, axis_name, perm)
        v_next = jax.lax.ppermute(v_blk, axis_name, perm)
        return (m_new, l_new, acc_new, k_next, v_next), None

    m0 = jnp.full((b, h, s_loc, 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((b, h, s_loc, 1), jnp.float32)
    acc0 = jnp.zeros((b, h, s_loc, d), jnp.float32)
    # initial accumulators are device-invariant constants; mark them as varying
    # over the mesh axis so the scan carry type matches the updated values.
    m0, l0, acc0 = (
        jax.lax.pcast(x, (axis_name,), to="varying") for x in (m0, l0, acc0)
    )
    (m, l, acc, _, _), _ = jax.lax.scan(step, (m0, l0, acc0, k, v), None, length=n)
    out = acc / jnp.maximum(l, 1e-30)
    return jnp.swapaxes(out, 1, 2).astype(q.dtype)


def ring_self_attention(
    q: Array,
    k: Array,
    v: Array,
    mesh: Mesh,
    axis_name: str = "data",
) -> Array:
    """Exact attention over [B, S, H, D] with S sharded on ``axis_name``.

    S must divide the mesh axis size. Inputs may live on host or any sharding;
    they are placed token-sharded, and the output comes back token-sharded.
    """
    n = mesh.shape[axis_name]
    s = q.shape[1]
    if s % n != 0:
        raise ValueError(f"token count {s} not divisible by mesh axis {axis_name}={n}")
    spec = P(None, axis_name, None, None)
    sharded = NamedSharding(mesh, spec)
    q, k, v = (jax.device_put(x, sharded) for x in (q, k, v))
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return jax.jit(fn)(q, k, v)
