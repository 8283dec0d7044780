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

import contextlib
import functools
import logging
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Array = jax.Array

logger = logging.getLogger(__name__)

_NEG_INF = -1e30

# Trace-time mesh context: model code (SpatialSelfAttention backend='ring')
# reads this instead of threading a Mesh through the (checkpointable,
# hashable) ModelSpec. Set it around the jit/apply call site.
_RING_CONTEXT: List[Tuple[Mesh, str]] = []


@contextlib.contextmanager
def ring_context(mesh: Mesh, axis_name: str = "data"):
    """Token-shard ring attention over ``mesh[axis_name]`` for model calls
    traced inside this context (SURVEY.md section 2.9 SP row).

    TRACE-time, not call-time: the context is consulted when the model
    function is traced, and it is NOT part of jit's cache key. A jitted
    function warmed up OUTSIDE the context keeps its cached dense executable
    when later called inside it (and vice versa) — jit/lower/warm up INSIDE
    the context, as the full-domain path and the driver dryrun do. The dense
    trace logs at trace time (ring_attention_inline) so a miswired program is
    visible in the logs rather than silently unsharded."""
    _RING_CONTEXT.append((mesh, axis_name))
    try:
        yield
    finally:
        _RING_CONTEXT.pop()


def current_ring_context() -> Optional[Tuple[Mesh, str]]:
    return _RING_CONTEXT[-1] if _RING_CONTEXT else None


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


def ring_attention_inline(q: Array, k: Array, v: Array, axis_name: str = "data") -> Array:
    """Traceable ring attention for use INSIDE a jitted model.

    Reads the ambient :func:`ring_context`; without one (or when the token
    count does not divide the mesh axis) it falls back to the exact dense
    XLA path, so ``backend='ring'`` models stay runnable everywhere — on a
    mesh they token-shard, single-device they behave like ``backend='xla'``.
    q/k/v: [B, S, H, D]; returns [B, S, H, D].
    """
    ctx = current_ring_context()
    if ctx is None:
        # trace-time decision (see ring_context docstring): say so, or a
        # program traced outside the context runs unsharded with no signal
        logger.info(
            "ring attention: no ring_context at trace time (tokens=%d); "
            "this layer traces DENSE", q.shape[1],
        )
        return jax.nn.dot_product_attention(q, k, v)
    mesh, axis = ctx
    axis = axis or axis_name
    n = mesh.shape[axis]
    s = q.shape[1]
    if n == 1 or s % n != 0:
        if n > 1:
            logger.warning(
                "ring attention: token count %d not divisible by mesh axis "
                "%r=%d; this layer runs dense", s, axis, n,
            )
        return jax.nn.dot_product_attention(q, k, v)
    spec = P(None, axis, None, None)
    # Keep the manual region sharding-isolated: without the replicated pins,
    # GSPMD propagates the token sharding into the surrounding conv pyramid,
    # where XLA's halo exchange MISCOMPILES stride-2 convs at degenerate
    # 1-row-per-shard sizes (measured: max|err| ~ 10.9 on an 8x8 map sharded
    # 8-way; fine at >=2 rows/shard). The ring region itself resharding
    # replicated->token-sharded->replicated is two cheap all-gathers of
    # attention-sized tensors.
    rep = NamedSharding(mesh, P())
    q, k, v = (jax.lax.with_sharding_constraint(x, rep) for x in (q, k, v))
    fn = jax.shard_map(
        functools.partial(_ring_attention_local, axis_name=axis),
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
    )
    return jax.lax.with_sharding_constraint(fn(q, k, v), rep)


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
