"""Device-mesh parallelism: DP training, sharded ensembles, TP-ready hooks.

The reference is strictly single-device (SURVEY.md §2.9 — no torch.distributed,
no NCCL/MPI); this package is the TPU-native capability it lacks: a
``jax.sharding.Mesh`` over ICI, ``NamedSharding`` batch placement, GSPMD
data-parallel gradients, and member-sharded ensemble generation.
"""

from sbgm_danra_tpu.parallel.mesh import make_mesh, replicate, shard_batch_spec

__all__ = ["make_mesh", "replicate", "shard_batch_spec"]
