"""Data-parallel device-resident sampling: day-sharded stacks, zero-collective
input path.

Design (VERDICT r4 item 8, SURVEY §2.9 loader rows): when training data
parallel over a mesh, the device-resident stacks (data/device_data.py) and the
rotating >HBM windows (data/windowed_data.py) shard on the DAY axis —
``NamedSharding(mesh, P('data'))`` — so each chip holds 1/n of the window and
per-chip HBM budget scales the residency: 8 chips hold an 8x bigger window (or
archive) than one. This is pod-sharded residency, the alternative named in the
r3/r4 verdicts to single-device windows.

Sampling is per-device under ``shard_map``: each device draws its
``batch/n_dev`` rows from its LOCAL day-shard with a key folded by
``axis_index``, and the outputs concatenate into the global batch sharded on
the batch axis — exactly the sharding ``parallel.train.make_parallel_steps``
expects. No collective appears anywhere in the input path (a global random
day-gather against a day-sharded stack would force XLA to all-gather the
window every step).

Distribution note: the global batch is a STRATIFIED sample — a fixed quota of
``batch/n_dev`` per day-shard instead of the reference's global i.i.d. draw
(/root/reference/sbgm/data_modules.py:747-763). With days assigned to shards
by position (the default day_put split) and the windowed loader's "strided"
layout decorrelating each window from season, per-shard quotas are uniform
over the archive; stratification only reduces the variance of the per-batch
day distribution vs i.i.d. — it never biases it.

The reference has no counterpart: its DataLoader workers feed each DDP rank an
independent host-side batch (training_utils.py:329-339).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sbgm_danra_tpu.data.device_data import DeviceStacks, make_sample_fn


def day_sharded_buffers(
    buffers: Tuple[jax.Array, ...], mesh: Mesh, axis: str = "data"
) -> Tuple[jax.Array, ...]:
    """Re-place a loader's ``buffers()`` tuple (hr, lr, lsm, topo, classifier)
    with the day-indexed arrays sharded over ``axis`` and the static fields
    replicated.

    Trims a non-divisible day count to the largest multiple of the axis size
    (days are plentiful; a remainder of < n_dev days is noise). On a real pod
    each host would ``device_put`` only its local shard; single-host JAX
    splits the committed array transparently.
    """
    hr, lr, lsm, topo, classifier = buffers
    n = mesh.shape[axis]
    d = (hr.shape[0] // n) * n
    if d == 0:
        raise ValueError(
            f"need at least {n} days to shard over {n} '{axis}' devices, "
            f"got {hr.shape[0]}"
        )
    day = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    return (
        jax.device_put(hr[:d], day),
        jax.device_put(lr[:d], day),
        jax.device_put(lsm, repl),
        jax.device_put(topo, repl),
        jax.device_put(classifier[:d], day),
    )


def make_dp_batch_sampler(
    mesh: Mesh,
    n_days: int,
    full_hw: Tuple[int, int],
    n_lr: int,
    crop_hw: Tuple[int, int],
    cutout_domains: Optional[Sequence[int]],
    batch_size: int,
    cfg_dropout_prob: float = 0.0,
    with_sdf: bool = True,
    axis: str = "data",
) -> Callable[..., Dict[str, jax.Array]]:
    """Compiled ``(key, hr, lr, lsm, topo, classifier) -> batch`` over
    day-sharded stacks; the batch comes back sharded on the batch axis.

    ``n_days`` is the GLOBAL (post-trim) day count; ``batch_size`` the global
    batch. Both must divide by the mesh axis size. The per-device body is the
    ordinary single-device sampler (data/device_data.make_sample_fn) built at
    local dimensions, with the key folded by ``axis_index`` so devices draw
    independent days/crops/CFG masks.
    """
    n_dev = mesh.shape[axis]
    if batch_size % n_dev:
        raise ValueError(f"batch_size {batch_size} % {n_dev} devices != 0")
    if n_days % n_dev:
        raise ValueError(
            f"n_days {n_days} % {n_dev} != 0 (trim via day_sharded_buffers)"
        )
    local = make_sample_fn(
        n_days // n_dev,
        full_hw,
        n_lr,
        crop_hw,
        cutout_domains,
        batch_size // n_dev,
        cfg_dropout_prob=cfg_dropout_prob,
        with_sdf=with_sdf,
    )

    def body(key, hr, lr, lsm, topo, classifier):
        key = jax.random.fold_in(key, jax.lax.axis_index(axis))
        return local(key, hr, lr, lsm, topo, classifier)

    sampler = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(), P(axis), P(axis), P(), P(), P(axis)),
        out_specs=P(axis),
    )
    return jax.jit(sampler)


def stacks_buffers(stacks: DeviceStacks) -> Tuple[jax.Array, ...]:
    """DeviceStacks -> the (hr, lr, lsm, topo, classifier) buffer tuple."""
    return (stacks.hr, stacks.lr, stacks.lsm, stacks.topo, stacks.classifier)
