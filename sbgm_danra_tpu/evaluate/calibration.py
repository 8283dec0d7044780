"""Ensemble spread calibration (variance inflation/deflation).

Beyond-reference capability (the reference has no ensemble post-processing at
all — its generate_repeated emits raw members,
/root/reference/sbgm/evaluate_sbgm/generation.py:269-314). Addresses the
measured overdispersion of learned-score ensembles (BASELINE.md learned-model
tables: normalized spread/skill 4-5): members are rescaled about their
ensemble mean by a single factor alpha fitted on held-out validation
ensembles,

    x_cal = mean + alpha * (x - mean)

This is the standard meteorological ensemble-inflation recipe, fitted here by
one of two rules:

- ``crps``          golden-section minimization of the mean fair CRPS on the
                    validation ensembles (direct target, robust);
- ``spread_skill``  closed form alpha = RMSE(ensemble mean) / fair spread,
                    which sets the fair spread/skill ratio to 1 (the classic
                    consistency condition for a reliable ensemble).

Both operate in whatever space the members are given in (normalized model
space in the quality-eval path); apply BEFORE back-transforming so physical
non-linearity (e.g. the precip log transform) doesn't distort the rescale.
"""

from __future__ import annotations

import numpy as np

from sbgm_danra_tpu.evaluate.crps import crps_ensemble

_GOLDEN = (np.sqrt(5.0) - 1.0) / 2.0


def _as_batched(members: np.ndarray, truth: np.ndarray):
    """Accept (K, H, W) vs (H, W) or (N, K, H, W) vs (N, H, W); return batched.

    Disambiguated on ndim (fields are always 2-D), NOT by shape matching —
    a shape test is ambiguous whenever the ensemble size K equals the case
    count N and would silently average over the wrong axis.
    """
    members = np.asarray(members, dtype=np.float64)
    truth = np.asarray(truth, dtype=np.float64)
    if members.ndim == 3 and truth.ndim == 2:
        members, truth = members[None], truth[None]  # (1, K, H, W), (1, H, W)
    elif not (members.ndim == 4 and truth.ndim == 3):
        raise ValueError(
            f"members {members.shape} incompatible with truth {truth.shape}; "
            "expected (K, H, W) vs (H, W) or (N, K, H, W) vs (N, H, W)"
        )
    if members.shape[0] != truth.shape[0] or members.shape[2:] != truth.shape[1:]:
        raise ValueError(
            f"members {members.shape} incompatible with truth {truth.shape}"
        )
    return members, truth


def apply_spread_scale(members: np.ndarray, alpha: float) -> np.ndarray:
    """Rescale members about their per-case ensemble mean.

    Fields are always (..., H, W), so the member axis is axis 0 for a single
    (K, H, W) ensemble and axis 1 for a batched (N, K, H, W) layout.
    """
    members = np.asarray(members)
    axis = 1 if members.ndim >= 4 else 0
    mean = members.mean(axis=axis, keepdims=True)
    return mean + float(alpha) * (members - mean)


def ensemble_spread_skill(members: np.ndarray, truth: np.ndarray) -> tuple:
    """(fair spread, RMSE of ensemble mean) pooled over all cases/pixels."""
    members, truth = _as_batched(members, truth)
    k = members.shape[1]
    mean = members.mean(axis=1)
    rmse = float(np.sqrt(((mean - truth) ** 2).mean()))
    var = ((members - mean[:, None]) ** 2).sum(axis=1).mean() / (k - 1)
    spread = float(np.sqrt(var * (k + 1) / k))  # fair correction
    return spread, rmse


def spread_scale_closed_form(members: np.ndarray, truth: np.ndarray) -> float:
    """alpha = RMSE(mean)/spread: sets fair spread/skill to 1."""
    spread, rmse = ensemble_spread_skill(members, truth)
    if spread <= 0:
        return 1.0
    return rmse / spread


def _mean_crps(members: np.ndarray, truth: np.ndarray) -> float:
    return float(
        np.mean([crps_ensemble(members[i], truth[i]).mean()
                 for i in range(members.shape[0])])
    )


def fit_spread_scale(
    members: np.ndarray,
    truth: np.ndarray,
    rule: str = "crps",
    lo: float = 0.02,
    hi: float = 3.0,
    tol: float = 1e-3,
) -> float:
    """Fit the inflation factor on validation ensembles.

    members: (N, K, H, W) (or a single (K, H, W) ensemble), truth: (N, H, W).
    """
    members, truth = _as_batched(members, truth)
    if rule == "spread_skill":
        return spread_scale_closed_form(members, truth)
    if rule != "crps":
        raise ValueError(f"unknown calibration rule {rule!r}")

    def objective(alpha: float) -> float:
        return _mean_crps(apply_spread_scale(members, alpha), truth)

    # golden-section search (objective is unimodal in alpha for fixed means)
    a, b = float(lo), float(hi)
    c = b - _GOLDEN * (b - a)
    d = a + _GOLDEN * (b - a)
    fc, fd = objective(c), objective(d)
    while b - a > tol:
        if fc < fd:
            b, d, fd = d, c, fc
            c = b - _GOLDEN * (b - a)
            fc = objective(c)
        else:
            a, c, fc = c, d, fd
            d = a + _GOLDEN * (b - a)
            fd = objective(d)
    return float((a + b) / 2.0)
