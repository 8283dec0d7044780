"""HR <-> LR correlation analysis.

Re-design of data_analysis_pipeline/correlations/: per (HR var, LR var) pair
aligned on shared dates (correlation_pipeline.py:113-117), with optional
stats-based normalization (:120-162):

- temporal correlation of domain-mean daily series, Pearson or Spearman
  (correlation_methods.py:30-48);
- per-pixel correlation over time — the reference loops pixels (O(HW) python,
  :50-76); here it is one vectorized covariance computation.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from sbgm_danra_tpu.data import zarrlite
from sbgm_danra_tpu.data.dataset import extract_2d
from sbgm_danra_tpu.utils.dates import file_date
from sbgm_danra_tpu.utils.units import correct_variable_units

logger = logging.getLogger(__name__)


def _rank(x: np.ndarray) -> np.ndarray:
    order = np.argsort(x)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(len(x))
    return ranks


def compute_temporal_correlation(
    series_a: np.ndarray, series_b: np.ndarray, method: str = "pearson"
) -> float:
    """Correlation of two daily domain-mean series (reference :30-48)."""
    a = np.asarray(series_a, np.float64)
    b = np.asarray(series_b, np.float64)
    if method == "spearman":
        a, b = _rank(a), _rank(b)
    elif method != "pearson":
        raise ValueError(f"Unknown method: {method}")
    return float(np.corrcoef(a, b)[0, 1])


def compute_spatial_correlation(
    fields_a: np.ndarray, fields_b: np.ndarray, method: str = "pearson"
) -> np.ndarray:
    """Per-pixel correlation over the time axis; fields (T, H, W).

    Vectorized: one pass of centered cross-products instead of the reference's
    per-pixel loop (correlation_methods.py:50-76).
    """
    a = np.asarray(fields_a, np.float64)
    b = np.asarray(fields_b, np.float64)
    if method == "spearman":
        a = np.apply_along_axis(_rank, 0, a)
        b = np.apply_along_axis(_rank, 0, b)
    a = a - a.mean(axis=0)
    b = b - b.mean(axis=0)
    num = (a * b).mean(axis=0)
    den = a.std(axis=0) * b.std(axis=0)
    with np.errstate(invalid="ignore", divide="ignore"):
        corr = num / den
    return np.where(den > 0, corr, np.nan)


def run_correlations(
    hr_store: str,
    lr_store: str,
    hr_variable: str,
    lr_variable: str,
    hr_model: str = "DANRA",
    lr_model: str = "ERA5",
    crop: Optional[Sequence[int]] = None,
    transforms: Optional[Dict[str, object]] = None,
    methods: Sequence[str] = ("pearson", "spearman"),
    max_days: Optional[int] = None,
) -> Dict[str, object]:
    """Full pair analysis on common dates (correlation_pipeline.py:34-197)."""
    g_hr, g_lr = zarrlite.open_group(hr_store), zarrlite.open_group(lr_store)
    map_hr = {file_date(k): k for k in g_hr.keys()}
    map_lr = {file_date(k): k for k in g_lr.keys()}
    dates = sorted(set(map_hr) & set(map_lr))
    if max_days:
        dates = dates[:max_days]
    if not dates:
        raise ValueError("No common dates between HR and LR stores")

    def load(g, m, var, model, d):
        f = correct_variable_units(var, model, extract_2d(g, m[d], var))
        if crop is not None:
            x1, x2, y1, y2 = crop
            f = f[x1:x2, y1:y2]
        if transforms and var in transforms:
            f = np.asarray(transforms[var](f), np.float32)
        return f

    hr = np.stack([load(g_hr, map_hr, hr_variable, hr_model, d) for d in dates])
    lr = np.stack([load(g_lr, map_lr, lr_variable, lr_model, d) for d in dates])

    out: Dict[str, object] = {"dates": dates, "n_days": len(dates)}
    mean_hr = hr.mean(axis=(1, 2))
    mean_lr = lr.mean(axis=(1, 2))
    # domain-mean series kept for the correlation figures
    # (pipelines/figures.py plot_correlation_figures)
    out["mean_series_hr"] = mean_hr
    out["mean_series_lr"] = mean_lr
    for method in methods:
        out[f"temporal_{method}"] = compute_temporal_correlation(mean_hr, mean_lr, method)
        out[f"spatial_{method}"] = compute_spatial_correlation(hr, lr, method)
    return out
