"""Reverse-SDE samplers compiled to single lax.scan programs."""

from sbgm_danra_tpu.sampling.guidance import apply_guidance, null_conditioning
from sbgm_danra_tpu.sampling.samplers import (
    SamplerConfig,
    dpmpp_sampler,
    edm_sampler,
    em_sampler,
    get_sampler,
    ode_sampler,
    pc_sampler,
)

__all__ = [
    "SamplerConfig",
    "apply_guidance",
    "null_conditioning",
    "dpmpp_sampler",
    "edm_sampler",
    "em_sampler",
    "pc_sampler",
    "ode_sampler",
    "get_sampler",
]
