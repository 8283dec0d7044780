"""Data-parallel train/eval steps over a device mesh.

GSPMD formulation: the train state is replicated, batches are sharded on the
``data`` axis, and the same single-device step function is jitted with explicit
in/out shardings — XLA inserts the gradient all-reduce over ICI (the
`psum` the reference's NCCL-free code never had). BatchNorm statistics are
computed over the *global* batch by construction (the batch-mean reduction
crosses shards inside the compiled program), which is stronger than torch DDP's
default unsynced BN.

Scaling note (jax-ml.github.io/scaling-book recipe): pick the mesh, annotate
shardings, let the compiler place collectives; no hand-written comms.
"""

from __future__ import annotations

from typing import Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.parallel.mesh import replicate, shard_batch_spec
from sbgm_danra_tpu.training.state import TrainState
from sbgm_danra_tpu.training.train_step import make_eval_step, make_train_step


def shard_state_tp(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a TrainState on a ('data','model') mesh with tensor-parallel
    parameter sharding.

    params and ema_params go through the tp partition rules directly; the
    optimizer moments (params-shaped subtrees inside the optax state) get the
    same spec by shape lookup — a moment tensor of a sharded kernel shares its
    shape, and equal shapes always map to the same spec, so the lookup is
    unambiguous. Everything else (scalars, counts, schedules) replicates.
    """
    from sbgm_danra_tpu.parallel import tp

    specs = tp.partition_specs(state.params)
    shape_to_spec = {}
    for leaf, spec in zip(
        jax.tree.leaves(state.params),
        jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)),
    ):
        if spec != P():
            shape_to_spec[tuple(leaf.shape)] = spec

    repl = replicate(mesh)

    def put_by_shape(leaf):
        spec = shape_to_spec.get(tuple(getattr(leaf, "shape", ())))
        if spec is None:
            return jax.device_put(leaf, repl)
        # divisibility fallback mirrors tp.shard_params
        for dim, axis in enumerate(spec):
            if axis is not None and leaf.shape[dim] % mesh.shape[axis] != 0:
                return jax.device_put(leaf, repl)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    # params and ema_params go through the NAME-based tp rules (the source of
    # truth); the shape lookup serves only the optimizer moments, whose optax
    # trees reuse param shapes but not param names. A non-kernel leaf that
    # merely coincides in shape with a sharded kernel therefore cannot be
    # mis-sharded in the param trees.
    state = state.replace(
        params=tp.shard_params(state.params, mesh),
        ema_params=tp.shard_params(state.ema_params, mesh),
    )
    placed_rest = jax.tree.map(
        put_by_shape,
        state.replace(params=None, ema_params=None),
    )
    return placed_rest.replace(params=state.params, ema_params=state.ema_params)


def make_parallel_steps(
    model, sde, cfg: Config, state: TrainState, mesh: Mesh, tp: bool = False
) -> Tuple:
    """Returns (train_step, eval_step, placed_state, batch_sharding).

    ``tp=False``: pure data parallelism — state replicated, batch sharded on
    ``data``. ``tp=True``: additionally shard large parameter kernels (and
    their optimizer moments) on the ``model`` axis per the tp partition rules;
    XLA inserts the weight all-gathers / gradient reduce-scatters.
    """
    repl = replicate(mesh)
    batch_sh = shard_batch_spec(mesh)

    if tp:
        state = shard_state_tp(state, mesh)
        state_sh = jax.tree.map(lambda x: x.sharding, state)
    else:
        # Replicate all state leaves across the mesh.
        state = jax.tree.map(lambda x: jax.device_put(x, repl), state)
        state_sh = repl

    base_train = make_train_step(
        model,
        sde,
        t_eps=cfg.sampler.t_eps,
        use_sdf_weights=cfg.training.sdf_weighted_loss,
        detect_anomaly=cfg.training.detect_anomaly,
        remat=cfg.training.remat,
        skip_nonfinite_updates=cfg.training.skip_nonfinite_updates,
    )
    base_eval = make_eval_step(
        model,
        sde,
        t_eps=cfg.sampler.t_eps,
        use_sdf_weights=cfg.training.sdf_weighted_loss,
    )

    train_step = jax.jit(
        base_train,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=(state_sh, repl),
        donate_argnums=0,  # reuse the old state's buffers in place
    )
    eval_step = jax.jit(
        base_eval,
        in_shardings=(state_sh, batch_sh, repl),
        out_shardings=repl,
    )
    return train_step, eval_step, state, batch_sh
