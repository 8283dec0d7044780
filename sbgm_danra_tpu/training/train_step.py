"""Compiled train/eval steps: DSM loss, gradients, EMA, BN stats, anomaly flags.

The per-batch hot loop of the reference (training.py:246-422) — extract, loss,
backward, step — compiled into one XLA program. The reference wraps every
backward in torch.autograd.detect_anomaly (training.py:403-405), a large
overhead; here anomaly detection is a cheap in-graph finiteness check on loss
and gradients whose flag is returned with the metrics (the host decides whether
to raise), so the hot path stays fused.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sbgm_danra_tpu.sde import dsm_loss
from sbgm_danra_tpu.training.state import TrainState

Array = jax.Array
Batch = Dict[str, Array]

_COND_KEYS = ("y", "cond_img", "lsm_cond", "topo_cond")


def _cond_kwargs(batch: Batch) -> Dict[str, Optional[Array]]:
    return {k: batch.get(k) for k in _COND_KEYS}


def make_train_step(
    model,
    sde,
    t_eps: float = 1e-3,
    use_sdf_weights: bool = True,
    detect_anomaly: bool = False,
    pmean_axis: Optional[str] = None,
    remat: bool = False,
    skip_nonfinite_updates: bool = False,
) -> Callable[[TrainState, Batch, Array], Tuple[TrainState, Dict[str, Array]]]:
    """Build the jittable train step.

    ``pmean_axis``: mesh axis name for gradient/metric psum-mean when the step
    runs under shard_map (data parallel); None for single-device.
    ``remat``: rematerialize the forward pass on backward (jax.checkpoint) —
    trades ~1.3x FLOPs for O(1) activation memory, enabling full-domain
    608x800 training batches that would otherwise exceed HBM.
    ``skip_nonfinite_updates``: in-graph elastic recovery — non-finite
    loss/grads leave the state untouched instead of poisoning it.
    """

    def loss_fn(params, state: TrainState, batch: Batch, rng: Array):
        mutated = {}

        def raw_score_fn(x_t, t, *cond_values):
            cond = dict(zip(_COND_KEYS, cond_values))
            out, mut = model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "buffers": state.buffers,
                },
                x_t,
                t,
                **cond,
                train=True,
                mutable=["batch_stats"],
            )
            # BN stats leave the (possibly rematerialized) scope as outputs —
            # a closure side effect would leak traced values under checkpoint.
            return out, mut["batch_stats"]

        checkpointed = jax.checkpoint(raw_score_fn) if remat else raw_score_fn

        def score_fn(x_t, t, **cond):
            out, bn = checkpointed(x_t, t, *(cond.get(k) for k in _COND_KEYS))
            mutated["batch_stats"] = bn
            return out

        loss = dsm_loss(
            score_fn,
            batch["x"],
            rng,
            sde=sde,
            t_eps=t_eps,
            sdf=batch.get("sdf") if use_sdf_weights else None,
            **_cond_kwargs(batch),
        )
        return loss, mutated.get("batch_stats", state.batch_stats)

    def train_step(state: TrainState, batch: Batch, rng: Array):
        (loss, new_bn), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, state, batch, rng
        )
        if pmean_axis is not None:
            grads = jax.lax.pmean(grads, pmean_axis)
            loss = jax.lax.pmean(loss, pmean_axis)
            new_bn = jax.lax.pmean(new_bn, pmean_axis)
        metrics = {"loss": loss}
        finite = None
        if detect_anomaly or skip_nonfinite_updates:
            finite = jnp.isfinite(loss)
            for g in jax.tree.leaves(grads):
                finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(g)))
            metrics["finite"] = finite
        new_state = state.apply_gradients(grads).replace(batch_stats=new_bn)
        if skip_nonfinite_updates:
            # elastic recovery: a poisoned batch costs one step, not the run —
            # keep the previous state (including step counter) when any
            # gradient is non-finite. The reference has no equivalent
            # (SURVEY.md §5.3: "a crash loses the epoch").
            new_state = jax.tree.map(
                lambda new, old: jnp.where(finite, new, old), new_state, state
            )
        return new_state, metrics

    return train_step


def make_eval_step(
    model, sde, t_eps: float = 1e-3, use_sdf_weights: bool = True,
    pmean_axis: Optional[str] = None, use_ema: bool = False,
) -> Callable[[TrainState, Batch, Array], Dict[str, Array]]:
    """Validation loss step (reference validate_batches, training.py:510-609)."""

    def eval_step(state: TrainState, batch: Batch, rng: Array):
        params = state.ema_params if use_ema else state.params

        def score_fn(x_t, t, **cond):
            return model.apply(
                {
                    "params": params,
                    "batch_stats": state.batch_stats,
                    "buffers": state.buffers,
                },
                x_t,
                t,
                **cond,
                train=False,
            )

        loss = dsm_loss(
            score_fn,
            batch["x"],
            rng,
            sde=sde,
            t_eps=t_eps,
            sdf=batch.get("sdf") if use_sdf_weights else None,
            **_cond_kwargs(batch),
        )
        if pmean_axis is not None:
            loss = jax.lax.pmean(loss, pmean_axis)
        return {"loss": loss}

    return eval_step


def make_score_fn(model, state: TrainState, use_ema: bool = True) -> Callable:
    """Closure for samplers: score_fn(x, t, **cond) using (EMA) params."""
    variables = {
        "params": state.ema_params if use_ema else state.params,
        "batch_stats": state.batch_stats,
        "buffers": state.buffers,
    }

    def score_fn(x, t, **cond):
        return model.apply(variables, x, t, **cond, train=False)

    return score_fn
