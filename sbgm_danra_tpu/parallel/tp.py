"""Tensor-parallel parameter sharding hooks.

The ~19M-param UNet does not need TP (SURVEY.md §2.9 — params fit in a sliver
of HBM); the design requirement is that the hooks EXIST so larger variants can
shard onto a ('data', 'model') mesh without restructuring. Rules place the
output-channel axis of large conv/dense kernels (and their biases/norm scales
when large) on the ``model`` axis; everything small stays replicated. GSPMD
then inserts the activation collectives.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sbgm_danra_tpu.parallel.mesh import MODEL_AXIS

# Only kernels at least this many output channels are worth sharding; below it
# the all-gather costs more than the memory/compute saved.
MIN_SHARD_CHANNELS = 128


def param_partition_spec(path: Tuple[str, ...], leaf) -> P:
    """PartitionSpec for one parameter leaf (path of module names)."""
    shape = getattr(leaf, "shape", ())
    name = path[-1] if path else ""
    if name == "kernel" and len(shape) == 4 and shape[-1] >= MIN_SHARD_CHANNELS:
        # conv kernel (kh, kw, in, out): shard output channels
        return P(None, None, None, MODEL_AXIS)
    if name == "kernel" and len(shape) == 2 and shape[-1] >= MIN_SHARD_CHANNELS:
        # dense kernel (in, out)
        return P(None, MODEL_AXIS)
    if name == "embedding" and len(shape) == 2 and shape[-1] >= MIN_SHARD_CHANNELS:
        return P(None, MODEL_AXIS)
    return P()  # replicated


def partition_specs(params) -> Any:
    """Pytree of PartitionSpecs matching ``params``."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    treedef = jax.tree_util.tree_structure(params)
    specs = []
    for key_path, leaf in flat:
        names = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in key_path
        )
        specs.append(param_partition_spec(names, leaf))
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_params(params, mesh: Mesh):
    """Place params on the mesh according to the partition rules.

    Parameters whose sharded dimension does not divide the model-axis size
    fall back to replication (with the divisor-friendly channel widths this
    model uses — multiples of 64 — that only affects tiny leaves).
    """
    specs = partition_specs(params)

    def put(leaf, spec):
        if spec != P():
            axis_sizes = [
                mesh.shape[a] for a in spec if a is not None and isinstance(a, str)
            ]
            dims = [i for i, a in enumerate(spec) if a is not None]
            for dim, n in zip(dims, axis_sizes):
                if leaf.shape[dim] % n != 0:
                    spec = P()
                    break
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree.map(put, params, specs)


def sharded_param_fraction(params, mesh: Mesh) -> float:
    """Fraction of parameter bytes actually sharded (diagnostics)."""
    specs = partition_specs(params)
    total = sharded = 0
    for leaf, spec in zip(jax.tree.leaves(params), jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P))):
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        if spec != P():
            sharded += n
    return sharded / max(total, 1)
