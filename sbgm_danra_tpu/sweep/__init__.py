"""Hyperparameter sweeps: samplers, pruners, sqlite-backed studies."""

from sbgm_danra_tpu.sweep.study import (
    GPSampler,
    HaltonSampler,
    RandomSampler,
    Study,
    SuccessiveHalvingPruner,
    Trial,
    TrialPruned,
)

__all__ = [
    "Study",
    "GPSampler",
    "Trial",
    "TrialPruned",
    "RandomSampler",
    "HaltonSampler",
    "SuccessiveHalvingPruner",
]
