"""Hyperparameter sweeps: samplers, pruners, sqlite-backed studies."""

from sbgm_danra_tpu.sweep.study import (
    HaltonSampler,
    RandomSampler,
    Study,
    SuccessiveHalvingPruner,
    Trial,
    TrialPruned,
)

__all__ = [
    "Study",
    "Trial",
    "TrialPruned",
    "RandomSampler",
    "HaltonSampler",
    "SuccessiveHalvingPruner",
]
