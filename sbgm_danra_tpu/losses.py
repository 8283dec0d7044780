"""Auxiliary loss functions (reference sbgm/utils.py:130-188).

The reference defines three loss modules that its main DSM path never uses
(training drives ``loss_fn``/our ``sde.dsm_loss`` instead): a plain MSE
(SimpleLoss), a trajectory-weighted MSE over T prediction steps (HybridLoss),
and an SDF-weighted MSE (SDFWeightedMSELoss — whose weighting rule DOES live
on inside the DSM loss, ``sde.sdf_weights``). Kept for capability parity as
pure functions; all trace under jit/vmap.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sbgm_danra_tpu.sde import sdf_weights

Array = jax.Array


def simple_loss(predicted: Array, target: Array) -> Array:
    """Mean squared error (reference SimpleLoss, utils.py:130-136)."""
    return jnp.mean((predicted - target) ** 2)


def hybrid_loss(predictions: Array, targets: Array, alpha: float = 0.5) -> Array:
    """Trajectory MSE (reference HybridLoss, utils.py:138-151).

    ``predictions``/``targets`` are stacked trajectories with the step axis
    leading (T, ...). Matches the reference exactly: the final prediction is
    scored against the first target, and each earlier prediction t-1 against
    target t, weighted by alpha.
    """
    t_steps = predictions.shape[0]
    loss = simple_loss(predictions[-1], targets[0])
    for t in range(1, t_steps):
        loss = loss + alpha * simple_loss(predictions[t - 1], targets[t])
    return loss


def sdf_weighted_mse(
    predicted: Array,
    target: Array,
    sdf: Array,
    max_land_weight: float = 1.0,
    min_sea_weight: float = 0.5,
) -> Array:
    """SDF-weighted MSE (reference SDFWeightedMSELoss, utils.py:153-188):
    w = sigmoid(sdf) (max_land - min_sea) + min_sea, mean of w * err^2."""
    w = sdf_weights(sdf, predicted, max_land_weight, min_sea_weight)
    return jnp.mean(w * (predicted - target) ** 2)
