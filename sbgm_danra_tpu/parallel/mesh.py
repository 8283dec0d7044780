"""Mesh construction and sharding helpers.

Conventions:
- axis ``data``: batch / ensemble-member parallelism over ICI;
- axis ``model``: reserved for tensor-parallel parameter sharding (hooks exist;
  at ~19M params the UNet does not need TP — SURVEY.md §2.9 — so the default
  mesh is 1 on this axis).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` (the
driver/launcher's job); ``jax.devices()`` then spans the full slice and the
same code runs unchanged.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sbgm_danra_tpu.config import Config

DATA_AXIS = "data"
MODEL_AXIS = "model"


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Multi-host bring-up: jax.distributed.initialize() when launched under a
    multi-host environment (SLURM/TPU pod metadata auto-detected by JAX), or
    with explicit coordinator parameters (read from COORDINATOR_ADDRESS /
    NUM_PROCESSES / PROCESS_ID env vars when not passed — the generic launcher
    contract for non-SLURM clusters).

    Returns the process count. Call once before make_mesh on pods; single-host
    runs detect nothing and return 1 — the same code path everywhere.
    """
    import os

    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])

    wants_multi = coordinator_address is not None or any(
        v in os.environ for v in ("SLURM_NTASKS", "MEGASCALE_COORDINATOR_ADDRESS")
    )
    if wants_multi:
        # No backend-touching queries before this point: jax.process_count()
        # would itself initialize XLA and make initialize() impossible.
        try:
            jax.distributed.initialize(
                coordinator_address=coordinator_address,
                num_processes=num_processes,
                process_id=process_id,
            )
        except RuntimeError as e:
            # already initialized (second call, or a pre-initialized backend)
            import logging

            logging.getLogger(__name__).warning(
                "jax.distributed.initialize skipped: %s", e
            )
    return jax.process_count()


def make_mesh(
    mesh_shape: Optional[Dict[str, int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a Mesh; default: all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = {DATA_AXIS: len(devices), MODEL_AXIS: 1}
    axis_names = tuple(mesh_shape.keys())
    shape = tuple(mesh_shape.values())
    n = int(np.prod(shape))
    if n != len(devices):
        raise ValueError(
            f"Mesh shape {mesh_shape} needs {n} devices, have {len(devices)}"
        )
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def mesh_from_config(cfg: Config, devices=None) -> Mesh:
    shape = cfg.parallel.mesh_shape
    if shape is not None:
        shape = {str(k): int(v) for k, v in shape.items()}
    return make_mesh(shape, devices)


def shard_batch_spec(mesh: Mesh) -> NamedSharding:
    """Batch axis sharded over data; everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicate(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict on the mesh, batch-axis sharded."""
    sharding = shard_batch_spec(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
