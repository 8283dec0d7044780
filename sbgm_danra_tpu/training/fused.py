"""Fused sample+train scan: K optimizer steps per device dispatch.

The device-resident loaders (data/device_data.py, data/windowed_data.py)
already assemble batches on-chip, but the eager training loop still pays two
dispatch round-trips per step (sampler + train step). On the remote-tunnel
platform a dispatch costs ~28 ms of RPC tax, which caps eager training at
~46 ms/step — measured 2,751 samples/s at batch 128 against 4,589 samples/s
for the identical program under ``lax.scan`` (BASELINE over-HBM table, r5).
This module removes the tax: one ``lax.scan`` dispatch draws K batches from
the resident stacks and applies K train steps, so the per-step host cost
amortizes to ~28/K ms AND the host core + tunnel stay free for the windowed
loader's background staging (the mechanism that starved in r4's over-HBM run).

The reference trains strictly one host-mediated batch per step
(/root/reference/sbgm/training.py:246-422 — DataLoader next + forward +
backward per iteration); there is no analogue of a multi-step device program.

Reproducibility contract: the caller supplies explicit per-step key arrays
(``batch_keys[K]`` for the sampler, ``step_keys[K]`` for the loss), so a
fused chunk consumes the SAME batch/key streams as K eager steps and matches
their outputs to XLA re-fusion tolerance (~1e-5 relative; the scan body is
one compiled program, so op order within fusions may differ —
tests/test_fused.py pins this). Loaders own the batch-key schedule
(fold_in(epoch_base, global_step) — the same stream their iterators use).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp

from sbgm_danra_tpu.training.train_step import make_train_step
from sbgm_danra_tpu.training.state import TrainState


def make_fused_train_step(
    model,
    sde,
    sample_raw: Callable,
    t_eps: float = 1e-3,
    use_sdf_weights: bool = True,
    remat: bool = False,
    skip_nonfinite_updates: bool = False,
    track_finite: bool = False,
) -> Callable:
    """Build the jitted fused step.

    ``sample_raw``: the UNwrapped compiled batch sampler exposed by
    make_batch_sampler — signature (key, hr, lr, lsm, topo, classifier) ->
    model-kwargs batch. It is invoked inside the scan body, so the whole
    chunk lowers to a single XLA program; the window stacks enter as scan
    CONSTANTS (plain jit arguments — never closure captures, see
    device_data.make_batch_sampler's lowering note).

    Returns ``fused(state, batch_keys, step_keys, hr, lr, lsm, topo,
    classifier) -> (state, metrics)`` where metrics["loss"] is the [K] loss
    trace (and metrics["finite"] the [K] finite flags when tracked). K is
    batch_keys.shape[0]; a different K compiles a new program, so callers
    should keep the chunk length fixed.
    """
    step = make_train_step(
        model,
        sde,
        t_eps=t_eps,
        use_sdf_weights=use_sdf_weights,
        detect_anomaly=track_finite,
        remat=remat,
        skip_nonfinite_updates=skip_nonfinite_updates,
    )

    def fused(
        state: TrainState,
        batch_keys: jax.Array,
        step_keys: jax.Array,
        hr: jax.Array,
        lr: jax.Array,
        lsm: jax.Array,
        topo: jax.Array,
        classifier: jax.Array,
    ) -> Tuple[TrainState, dict]:
        def body(carry, keys):
            bk, sk = keys
            batch = sample_raw(bk, hr, lr, lsm, topo, classifier)
            new_state, metrics = step(carry, batch, sk)
            out = {"loss": metrics["loss"]}
            if track_finite:
                out["finite"] = metrics["finite"]
            return new_state, out

        state, traces = jax.lax.scan(body, state, (batch_keys, step_keys))
        return state, traces

    return jax.jit(fused, donate_argnums=0)


def chunk_keys(
    base: jax.Array, start_step: int, chunk_steps: int
) -> jax.Array:
    """The loader-side batch-key schedule for steps [start, start+K): the
    same fold_in(epoch_base, global_step) stream the eager iterators emit."""
    return jax.vmap(lambda i: jax.random.fold_in(base, i))(
        start_step + jnp.arange(chunk_steps)
    )
