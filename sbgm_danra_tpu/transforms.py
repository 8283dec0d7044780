"""Per-variable normalization transforms and their exact inverses.

TPU-native re-design of the reference transform library
(sbgm/special_transforms.py). Transforms here are frozen dataclasses whose
``__call__`` is pure jnp/np arithmetic, so they are jittable, vmappable and can
run on-device inside the input pipeline or fused into the sampler epilogue.

Numerical semantics preserved bit-for-bit from the reference (a stated parity
requirement, see BASELINE.md):

- ``ZScore``:  (x - mean) / (std + 1e-8); inverse x * (std + 1e-8) + mean
  (reference special_transforms.py:143-233).
- ``LinearScale``: affine map between intervals (reference :62-138).
- ``LogTransform`` forward: log(x + eps) with eps=0.01, then optional scaling in
  log space. The [log_min, log_max] range is *expanded by buffer_frac * range on
  each side at construction time* (reference :265-269).
- ``LogBackTransform``: expands the range by only buffer_frac/2 per side
  (reference :393-399 — asymmetric with the forward on purpose; preserved),
  clamps log-space values to [clamp_log_min, clamp_log_max] and exponentiates
  (reference :418-462). Stats-built inverses clamp to the *observed* (unexpanded)
  log min/max (reference :679-681).

Scaling-method names accepted match the reference config surface:
``zscore``, ``scale01``/``01``, ``scale_minus1_1``, ``log``, ``log_01``,
``log_minus1_1``, ``log_zscore``.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Mapping, Optional, Sequence

import jax.numpy as jnp
import numpy as np

_EPS = 1e-8


def _xp(x):
    """numpy for host arrays/scalars, jnp for device arrays and tracers.

    Transforms run in two worlds: inside jitted programs (sampler epilogue,
    device input pipeline) and on the HOST inside dataset loading. A bare
    ``jnp.log`` silently turns every host-side call into a device dispatch —
    which (a) makes archive loading compete with training for the device
    queue (the windowed stager starved behind an unbounded dispatch backlog,
    over_hbm_bench), and (b) ships each field through the remote tunnel.
    Tracers are ``jax.Array`` instances, so the jit path keeps working.
    """
    return jnp if isinstance(x, jnp.ndarray) else np


class Transform:
    """Base class: a callable array -> array with an exact ``inverse()``."""

    def __call__(self, x):  # pragma: no cover - interface
        raise NotImplementedError

    def inverse(self) -> "Transform":  # pragma: no cover - interface
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Transform):
    def __call__(self, x):
        return x

    def inverse(self) -> "Identity":
        return Identity()


@dataclasses.dataclass(frozen=True)
class ZScore(Transform):
    """(x - mean) / (std + 1e-8) (reference special_transforms.py:143-184)."""

    mean: float
    std: float

    def __call__(self, x):
        return (x - self.mean) / (self.std + _EPS)

    def inverse(self) -> "ZScoreBack":
        return ZScoreBack(self.mean, self.std)


@dataclasses.dataclass(frozen=True)
class ZScoreBack(Transform):
    mean: float
    std: float

    def __call__(self, x):
        return x * (self.std + _EPS) + self.mean

    def inverse(self) -> ZScore:
        return ZScore(self.mean, self.std)


@dataclasses.dataclass(frozen=True)
class LinearScale(Transform):
    """Map [data_min, data_max] -> [out_low, out_high] (reference :62-100)."""

    out_low: float
    out_high: float
    data_min: float = 0.0
    data_max: float = 1.0

    def __call__(self, x):
        old_range = self.data_max - self.data_min
        new_range = self.out_high - self.out_low
        return ((x - self.data_min) * new_range) / old_range + self.out_low

    def inverse(self) -> "LinearScaleBack":
        return LinearScaleBack(self.out_low, self.out_high, self.data_min, self.data_max)


@dataclasses.dataclass(frozen=True)
class LinearScaleBack(Transform):
    """Map [out_low, out_high] back to [data_min, data_max] (reference :103-138)."""

    out_low: float = 0.0
    out_high: float = 1.0
    data_min: float = 0.0
    data_max: float = 1.0

    def __call__(self, x):
        old_range = self.out_high - self.out_low
        new_range = self.data_max - self.data_min
        return ((x - self.out_low) * new_range) / old_range + self.data_min

    def inverse(self) -> LinearScale:
        return LinearScale(self.out_low, self.out_high, self.data_min, self.data_max)


def _expanded_log_range(
    log_min: Optional[float], log_max: Optional[float], frac: float
) -> tuple[Optional[float], Optional[float]]:
    if log_min is None or log_max is None:
        return log_min, log_max
    rng = log_max - log_min
    return log_min - frac * rng, log_max + frac * rng


@dataclasses.dataclass(frozen=True)
class LogTransform(Transform):
    """log(x + eps) then optional scaling in log space (reference :239-341).

    ``scale_type``: 'log' | 'log_01' | 'log_minus1_1' | 'log_zscore'.
    [log_min, log_max] is expanded by buffer_frac*range per side at construction.
    """

    scale_type: str = "log_zscore"
    eps: float = 0.01
    log_mean: Optional[float] = None
    log_std: Optional[float] = None
    log_min: Optional[float] = None
    log_max: Optional[float] = None
    buffer_frac: float = 0.5

    def __post_init__(self):
        lo, hi = _expanded_log_range(self.log_min, self.log_max, self.buffer_frac)
        object.__setattr__(self, "_lo", lo)
        object.__setattr__(self, "_hi", hi)
        if self.scale_type == "log_zscore":
            if self.log_mean is None or self.log_std is None:
                raise ValueError("log_zscore requires log_mean and log_std")
        elif self.scale_type in ("log_01", "log_minus1_1"):
            if self.log_min is None or self.log_max is None:
                raise ValueError(f"{self.scale_type} requires log_min and log_max")
        elif self.scale_type != "log":
            raise ValueError(f"Unknown log scale_type: {self.scale_type}")

    def __call__(self, x):
        logx = _xp(x).log(x + self.eps)
        if self.scale_type == "log_zscore":
            return (logx - self.log_mean) / (self.log_std + _EPS)
        if self.scale_type == "log_01":
            denom = self._hi - self._lo
            return (logx - self._lo) / denom
        if self.scale_type == "log_minus1_1":
            return 2.0 * (logx - self._lo) / (self._hi - self._lo) - 1.0
        return logx  # 'log'

    def inverse(self) -> "LogBackTransform":
        # Inverse of the *expanded* forward map; note the reference back-transform
        # re-expands the raw range by buffer_frac/2, so to invert the forward
        # exactly, hand it the already-expanded range with buffer_frac=0.
        return LogBackTransform(
            scale_type=self.scale_type,
            log_mean=self.log_mean,
            log_std=self.log_std,
            log_min=self._lo,
            log_max=self._hi,
            buffer_frac=0.0,
        )


@dataclasses.dataclass(frozen=True)
class LogBackTransform(Transform):
    """Invert log-space scaling, clamp, exponentiate (reference :360-462).

    Construction expands [log_min, log_max] by buffer_frac/2 per side — this
    matches the reference's asymmetric convention (:393-399). ``clamp_log_min``/
    ``clamp_log_max`` bound the log-space values before exp (defaults: no clamp).
    """

    scale_type: str = "log_zscore"
    log_mean: Optional[float] = None
    log_std: Optional[float] = None
    log_min: Optional[float] = None
    log_max: Optional[float] = None
    buffer_frac: float = 0.5
    clamp_log_min: Optional[float] = None
    clamp_log_max: Optional[float] = None

    def __post_init__(self):
        lo, hi = _expanded_log_range(self.log_min, self.log_max, self.buffer_frac / 2.0)
        object.__setattr__(self, "_lo", lo)
        object.__setattr__(self, "_hi", hi)
        clo = float("-inf") if self.clamp_log_min is None else float(self.clamp_log_min)
        chi = float("inf") if self.clamp_log_max is None else float(self.clamp_log_max)
        object.__setattr__(self, "_clo", clo)
        object.__setattr__(self, "_chi", chi)
        if self.scale_type == "log_zscore":
            if self.log_mean is None or self.log_std is None:
                raise ValueError("log_zscore requires log_mean and log_std")
        elif self.scale_type in ("log_01", "log_minus1_1"):
            if self.log_min is None or self.log_max is None:
                raise ValueError(f"{self.scale_type} requires log_min and log_max")
        elif self.scale_type != "log":
            raise ValueError(f"Unknown log scale_type: {self.scale_type}")

    def __call__(self, x):
        if self.scale_type == "log_01":
            logx = x * (self._hi - self._lo) + self._lo
        elif self.scale_type == "log_zscore":
            logx = x * (self.log_std + _EPS) + self.log_mean
        elif self.scale_type == "log_minus1_1":
            logx = 0.5 * (x + 1.0) * (self._hi - self._lo) + self._lo
        else:  # 'log'
            logx = x
        xp = _xp(logx)
        logx = xp.clip(logx, self._clo, self._chi)
        return xp.exp(logx)


@dataclasses.dataclass(frozen=True)
class Compose(Transform):
    transforms: tuple

    def __call__(self, x):
        for t in self.transforms:
            x = t(x)
        return x

    def inverse(self) -> "Compose":
        return Compose(tuple(t.inverse() for t in reversed(self.transforms)))


# ---------------------------------------------------------------------------
# Stats-driven factories (reference special_transforms.py:523-683)
# ---------------------------------------------------------------------------

_LOG_TYPES = ("log", "log_01", "log_minus1_1", "log_zscore")


def transform_from_stats(
    transform_type: str, stats: Mapping[str, float], buffer_frac: float = 0.5
) -> Transform:
    """Forward transform from a global-stats dict (reference :595-637).

    Stats keys follow the reference stats JSON schema: mean/std/min/max and
    log_mean/log_std/log_min/log_max.
    """
    if transform_type == "zscore":
        return ZScore(mean=stats["mean"], std=stats["std"])
    if transform_type in ("scale01", "01"):
        return LinearScale(0.0, 1.0, data_min=stats["min"], data_max=stats["max"])
    if transform_type == "scale_minus1_1":
        return LinearScale(-1.0, 1.0, data_min=stats["min"], data_max=stats["max"])
    if transform_type in _LOG_TYPES:
        return LogTransform(
            scale_type=transform_type,
            log_mean=stats["log_mean"],
            log_std=stats["log_std"],
            log_min=stats["log_min"],
            log_max=stats["log_max"],
            buffer_frac=buffer_frac,
        )
    if transform_type in (None, "none"):
        return Identity()
    raise ValueError(f"Unknown transform type: {transform_type}")


def back_transform_from_stats(
    transform_type: str, stats: Mapping[str, float], buffer_frac: float = 0.5
) -> Transform:
    """Inverse transform from a global-stats dict (reference :639-683).

    Log variants clamp to the observed (unexpanded) log min/max, matching the
    reference's get_backtransforms_from_stats (:679-681).
    """
    if transform_type == "zscore":
        return ZScoreBack(mean=stats["mean"], std=stats["std"])
    if transform_type in ("scale01", "01"):
        return LinearScaleBack(0.0, 1.0, data_min=stats["min"], data_max=stats["max"])
    if transform_type == "scale_minus1_1":
        return LinearScaleBack(-1.0, 1.0, data_min=stats["min"], data_max=stats["max"])
    if transform_type in _LOG_TYPES:
        return LogBackTransform(
            scale_type=transform_type,
            log_mean=stats["log_mean"],
            log_std=stats["log_std"],
            log_min=stats["log_min"],
            log_max=stats["log_max"],
            buffer_frac=buffer_frac,
            clamp_log_min=stats["log_min"],
            clamp_log_max=stats["log_max"],
        )
    if transform_type in (None, "none"):
        return Identity()
    raise ValueError(f"Unknown transform type: {transform_type}")


def stats_path(
    root: str, model: str, variable: str, domain_str: str, crop_region_str: str, split: str
) -> str:
    """Path convention for global-stats JSONs (reference :576-591)."""
    fname = (
        f"global_stats__{model}__{domain_str}__crop__{crop_region_str}"
        f"__{variable}__{split}.json"
    )
    return os.path.join(root, model, variable, split, fname)


def load_global_stats(
    root: str, model: str, variable: str, domain_str: str, crop_region_str: str, split: str
) -> Optional[Dict[str, float]]:
    path = stats_path(root, model, variable, domain_str, crop_region_str, split)
    if not os.path.exists(path):
        return None
    with open(path, "r") as f:
        return json.load(f)


def _load_required_stats(root, model, variable, domain_str, crop_region_str, split):
    stats = load_global_stats(root, model, variable, domain_str, crop_region_str, split)
    if stats is None:
        raise FileNotFoundError(
            "Global stats not found: "
            + stats_path(root, model, variable, domain_str, crop_region_str, split)
            + " — run the statistics pipeline first "
            "(sbgm_danra_tpu.pipelines.stats_pipeline)."
        )
    return stats


def build_back_transforms_from_stats(
    hr_var: str,
    hr_model: str,
    domain_str_hr: str,
    crop_region_str_hr: str,
    hr_scaling_method: str,
    hr_buffer_frac: float,
    lr_vars: Sequence[str],
    lr_model: str,
    domain_str_lr: str,
    crop_region_str_lr: str,
    lr_scaling_methods: Sequence[str],
    lr_buffer_frac: float,
    split: str,
    stats_dir_root: str,
) -> Dict[str, Transform]:
    """Dict of inverse transforms keyed '{var}_hr', '{cond}_lr', 'generated'.

    Mirrors reference build_back_transforms_from_stats (special_transforms.py:523-572);
    'generated' shares the HR target's space.
    """
    bt: Dict[str, Transform] = {}
    hr_stats = _load_required_stats(
        stats_dir_root, hr_model, hr_var, domain_str_hr, crop_region_str_hr, split
    )
    inv_hr = back_transform_from_stats(hr_scaling_method, hr_stats, hr_buffer_frac)
    bt[f"{hr_var}_hr"] = inv_hr
    bt["generated"] = inv_hr
    for cond, method in zip(lr_vars, lr_scaling_methods):
        lr_stats = _load_required_stats(
            stats_dir_root, lr_model, cond, domain_str_lr, crop_region_str_lr, split
        )
        bt[f"{cond}_lr"] = back_transform_from_stats(method, lr_stats, lr_buffer_frac)
    return bt


def build_back_transforms(
    hr_var: str,
    hr_scaling_method: str,
    hr_scaling_params: Mapping[str, float],
    lr_vars: Sequence[str],
    lr_scaling_methods: Sequence[str],
    lr_scaling_params: Sequence[Mapping[str, float]],
) -> Dict[str, Transform]:
    """Inline-params variant (reference special_transforms.py:465-520).

    Param dicts use the legacy config keys glob_mean/glob_std/glob_min/glob_max/
    glob_*_log/buffer_frac/clamp_log_min/clamp_log_max.
    """

    def _one(method: str, p: Mapping[str, float]) -> Transform:
        if method in _LOG_TYPES:
            return LogBackTransform(
                scale_type=method,
                log_mean=p.get("glob_mean_log"),
                log_std=p.get("glob_std_log"),
                log_min=p.get("glob_min_log"),
                log_max=p.get("glob_max_log"),
                buffer_frac=p.get("buffer_frac", 0.5),
                clamp_log_min=p.get("clamp_log_min"),
                clamp_log_max=p.get("clamp_log_max"),
            )
        if method == "zscore":
            return ZScoreBack(p["glob_mean"], p["glob_std"])
        if method in ("01", "scale01"):
            return LinearScaleBack(0.0, 1.0, p["glob_min"], p["glob_max"])
        if method == "scale_minus1_1":
            return LinearScaleBack(-1.0, 1.0, p["glob_min"], p["glob_max"])
        if method in ("none", None):
            return Identity()
        raise ValueError(f"Unknown scaling method: {method}")

    bt: Dict[str, Transform] = {}
    inv = _one(hr_scaling_method, hr_scaling_params)
    bt[f"{hr_var}_hr"] = inv
    bt["generated"] = inv
    for cond, method, params in zip(lr_vars, lr_scaling_methods, lr_scaling_params):
        bt[f"{cond}_lr"] = _one(method, params)
    return bt
