"""Classifier-free guidance for conditional score models.

Re-design of the reference's guided_score_fn (sbgm/score_sampling.py:10-56) with
its exact null protocol:

- LR conditioning image -> zeros;
- geo maps (value||mask, 2 channels) -> keep the value channel, zero ONLY the
  mask channel (:30-39);
- class label -> null token 0 (:42).

TPU-first difference: instead of two sequential model calls per step, the
conditional and unconditional branches are stacked into one batch of 2B and run
through a single forward pass — same FLOPs, half the dispatches, and the doubled
batch keeps the MXU fuller at the small batch sizes typical of sampling.
(BatchNorm runs in inference mode during sampling, so stacking cannot leak
statistics between branches.)
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

Array = jax.Array

NULL_TOKEN = 0


def strip_mask_channel(geo: Optional[Array]) -> Optional[Array]:
    """Zero the mask channel (last of 2, NHWC) leaving the value channel intact."""
    if geo is None or geo.shape[-1] != 2:
        return geo
    return geo.at[..., 1].set(0.0)


def null_conditioning(cond: Dict[str, Optional[Array]]) -> Dict[str, Optional[Array]]:
    """Build the unconditional branch's inputs from conditional ones."""
    out = dict(cond)
    if out.get("cond_img") is not None:
        out["cond_img"] = jnp.zeros_like(out["cond_img"])
    out["lsm_cond"] = strip_mask_channel(out.get("lsm_cond"))
    out["topo_cond"] = strip_mask_channel(out.get("topo_cond"))
    if out.get("y") is not None:
        out["y"] = jnp.full_like(out["y"], NULL_TOKEN)
    return out


def apply_guidance(
    score_fn: Callable[..., Array],
    scale: Optional[float],
    max_scale: Optional[float] = None,
) -> Callable[..., Array]:
    """Wrap a score function with classifier-free guidance.

    guided = (1 + w) * s_cond - w * s_uncond (reference :55). ``scale=None``
    returns the plain conditional score function unchanged. ``max_scale``
    clamps the guidance weight (reference pc_sampler :184-186).
    """
    if scale is None:
        return score_fn
    w = float(scale)
    if max_scale is not None:
        w = min(w, float(max_scale))

    def guided(x: Array, t: Array, **cond) -> Array:
        ncond = null_conditioning(cond)
        both_x = jnp.concatenate([x, x], axis=0)
        both_t = jnp.concatenate([t, t], axis=0)
        merged = {}
        for key in cond:
            c, n = cond[key], ncond[key]
            merged[key] = None if c is None else jnp.concatenate([c, n], axis=0)
        scores = score_fn(both_x, both_t, **merged)
        s_cond, s_uncond = jnp.split(scores, 2, axis=0)
        return (1.0 + w) * s_cond - w * s_uncond

    return guided
