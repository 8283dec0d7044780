"""Full-DANRA-domain sampling: 589x789 fields through the /32 UNet pyramid.

The reference never samples the full domain — it trains and generates on
128x128 cutouts (sbgm/config/default_config.yaml:20) because dense attention
at full resolution is infeasible (SURVEY.md §5.7). Here the full 589x789 HR
grid is padded to 608x800 (the next multiples of 32 for the five-stage
pyramid, BASELINE.json config 4), sampled in one compiled reverse-SDE scan —
with the streaming Pallas flash-attention kernel carrying the large token
counts — and cropped back.

Padding is edge-replicate for continuous fields and the geo value channels,
zero for CFG mask channels (padding should not claim 'conditioning present'
outside the physical domain).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
from sbgm_danra_tpu.sde import VESDE

logger = logging.getLogger(__name__)

PYRAMID_MULTIPLE = 32  # stride of the deepest encoder stage


def padded_dims(h: int, w: int, multiple: int = PYRAMID_MULTIPLE) -> Tuple[int, int]:
    return (-(-h // multiple) * multiple, -(-w // multiple) * multiple)


def pad_field(x: jnp.ndarray, target_hw: Tuple[int, int], mode: str = "edge") -> jnp.ndarray:
    """Pad NHWC (or NHW) spatial dims up to target; edge-replicate by default."""
    h, w = x.shape[1], x.shape[2]
    ph, pw = target_hw[0] - h, target_hw[1] - w
    if ph < 0 or pw < 0:
        raise ValueError(f"target {target_hw} smaller than field {(h, w)}")
    if ph == 0 and pw == 0:
        return x
    pad = [(0, 0), (0, ph), (0, pw)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad, mode=mode)


def pad_conditioning(
    cond: Dict[str, jnp.ndarray], target_hw: Tuple[int, int]
) -> Dict[str, jnp.ndarray]:
    """Pad each spatial conditioning field; geo masks are value||mask 2-channel,
    value edge-padded, mask zero-padded."""
    out: Dict[str, jnp.ndarray] = {}
    for key, v in cond.items():
        if v is None or v.ndim < 3:
            out[key] = v
            continue
        if key in ("lsm_cond", "topo_cond") and v.shape[-1] == 2:
            value = pad_field(v[..., :1], target_hw, "edge")
            mask = pad_field(v[..., 1:], target_hw, "constant")
            out[key] = jnp.concatenate([value, mask], axis=-1)
        else:
            out[key] = pad_field(v, target_hw, "edge")
    return out


def sample_full_domain(
    score_fn,
    rng: jax.Array,
    cond: Dict[str, jnp.ndarray],
    domain_hw: Tuple[int, int] = (589, 789),
    batch: int = 1,
    sde: VESDE = VESDE(),
    config: SamplerConfig = SamplerConfig(),
    sampler: str = "pc_sampler",
) -> np.ndarray:
    """Generate full-domain HR fields; returns (batch, H, W) cropped to domain."""
    target = padded_dims(*domain_hw)
    padded_cond = pad_conditioning(cond, target)
    sampler_fn = get_sampler(sampler)
    shape = (batch, target[0], target[1], 1)
    run = jax.jit(
        lambda key, c: sampler_fn(score_fn, key, shape, sde, config, cond=c)
    )
    out = run(rng, padded_cond)
    return np.asarray(out)[:, : domain_hw[0], : domain_hw[1], 0]
