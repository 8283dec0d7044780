"""Global statistics computation — the normalization contract of the system.

Re-design of the reference stats pipeline
(data_analysis_pipeline/stats_analysis/statistics.py:114-292 and
data_stats_pipeline.py:18-217): per (model, variable) it streams the daily
fields of a split, applies unit corrections and optional cropping, accumulates
global mean/std/min/max plus the log-space variants, and writes the JSON the
training transforms consume (the exact path convention of
special_transforms.py:576-591).

Streaming accumulation (count/sum/sumsq + running extrema) replaces the
reference's load-everything-then-reduce, so full 30-year archives fit in
constant memory; a thread pool mirrors its ProcessPoolExecutor loading
(data_loading.py:142-158).
"""

from __future__ import annotations

import concurrent.futures as cf
import json
import logging
import os
from typing import Dict, Iterable, Mapping, Optional, Sequence, Tuple

import numpy as np

from sbgm_danra_tpu import transforms as T
from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.data import zarrlite
from sbgm_danra_tpu.data.dataset import extract_2d
from sbgm_danra_tpu.data.paths import build_data_path
from sbgm_danra_tpu.utils.units import correct_variable_units

logger = logging.getLogger(__name__)

LOG_EPS = 0.01  # matches PrcpLogTransform eps (special_transforms.py:246)


class StreamingStats:
    """Constant-memory accumulation of global + log-space statistics."""

    def __init__(self):
        self.n = 0
        self.sum = 0.0
        self.sumsq = 0.0
        self.min = np.inf
        self.max = -np.inf
        self.log_sum = 0.0
        self.log_sumsq = 0.0
        self.log_min = np.inf
        self.log_max = -np.inf

    def update(self, field: np.ndarray) -> None:
        x = np.asarray(field, dtype=np.float64).ravel()
        self.n += x.size
        self.sum += x.sum()
        self.sumsq += (x * x).sum()
        self.min = min(self.min, float(x.min()))
        self.max = max(self.max, float(x.max()))
        logx = np.log(np.maximum(x, 0.0) + LOG_EPS)
        self.log_sum += logx.sum()
        self.log_sumsq += (logx * logx).sum()
        self.log_min = min(self.log_min, float(logx.min()))
        self.log_max = max(self.log_max, float(logx.max()))

    def finalize(self) -> Dict[str, float]:
        if self.n == 0:
            raise ValueError("No data accumulated")
        mean = self.sum / self.n
        var = max(self.sumsq / self.n - mean * mean, 0.0)
        log_mean = self.log_sum / self.n
        log_var = max(self.log_sumsq / self.n - log_mean * log_mean, 0.0)
        return {
            "n": self.n,
            "mean": mean,
            "std": float(np.sqrt(var)),
            "min": self.min,
            "max": self.max,
            "log_mean": log_mean,
            "log_std": float(np.sqrt(log_var)),
            "log_min": self.log_min,
            "log_max": self.log_max,
        }


_AGG_METHODS = {"mean": np.mean, "sum": np.sum, "max": np.max, "min": np.min}


def aggregate_fields(
    fields: Sequence[np.ndarray],
    timestamps: Sequence,
    agg_time: str,
    agg_method: str = "mean",
) -> Dict[str, object]:
    """Temporal aggregation of daily fields to weekly/monthly/yearly composites.

    Re-design of the reference's aggregate_data
    (data_analysis_pipeline/stats_analysis/statistics.py:17-107): groups daily
    fields by ISO week / month / year and reduces each group with
    mean/sum/max/min; group timestamps are the period starts. ``daily`` is a
    no-op stack. One vectorized reduce per group replaces the reference's
    per-group Python list shuffling.
    """
    import datetime

    ts = [
        datetime.datetime.fromisoformat(t) if isinstance(t, str) else t
        for t in timestamps
    ]
    if len(fields) != len(ts):
        raise ValueError(f"{len(fields)} fields vs {len(ts)} timestamps")
    stack = np.stack([np.asarray(f) for f in fields])
    if agg_time == "daily":
        return {"cutouts": stack, "stack": stack.ravel(), "timestamps": ts}
    if agg_method not in _AGG_METHODS:
        raise ValueError(f"Unsupported aggregation method: {agg_method}")

    def group_key(t):
        if agg_time == "weekly":
            iso = t.isocalendar()
            return (iso[0], iso[1])
        if agg_time == "monthly":
            return (t.year, t.month)
        if agg_time == "yearly":
            return (t.year,)
        raise ValueError(f"Unsupported aggregation_time: {agg_time}")

    groups: Dict[tuple, list] = {}
    for idx, t in enumerate(ts):
        groups.setdefault(group_key(t), []).append(idx)

    reduce = _AGG_METHODS[agg_method]
    out_fields, out_ts = [], []
    for key in sorted(groups):
        out_fields.append(reduce(stack[groups[key]], axis=0))
        if agg_time == "weekly":
            # start of the ISO week
            out_ts.append(datetime.datetime.fromisocalendar(key[0], key[1], 1))
        elif agg_time == "monthly":
            out_ts.append(datetime.datetime(key[0], key[1], 1))
        else:
            out_ts.append(datetime.datetime(key[0], 1, 1))
    agg = np.stack(out_fields)
    return {"cutouts": agg, "stack": agg.ravel(), "timestamps": out_ts}


def aggregate_stream(
    items,
    agg_time: str,
    agg_method: str = "mean",
):
    """Constant-memory variant of :func:`aggregate_fields`.

    ``items`` yields (field, timestamp) in date order; composites are reduced
    incrementally per period (running sum/max/min + count), so peak memory is
    one field — full 30-year archives aggregate without materializing the
    daily stack. Yields (period_start, composite) as periods complete.
    """
    import datetime

    if agg_method not in _AGG_METHODS:
        raise ValueError(f"Unsupported aggregation method: {agg_method}")

    def group_key(t):
        if agg_time == "weekly":
            iso = t.isocalendar()
            return (iso[0], iso[1])
        if agg_time == "monthly":
            return (t.year, t.month)
        if agg_time == "yearly":
            return (t.year,)
        if agg_time == "daily":
            return None
        raise ValueError(f"Unsupported aggregation_time: {agg_time}")

    def period_start(key):
        if agg_time == "weekly":
            return datetime.datetime.fromisocalendar(key[0], key[1], 1)
        if agg_time == "monthly":
            return datetime.datetime(key[0], key[1], 1)
        return datetime.datetime(key[0], 1, 1)

    acc, count, cur = None, 0, None
    closed = set()
    for field, ts in items:
        t = datetime.datetime.fromisoformat(ts) if isinstance(ts, str) else ts
        field = np.asarray(field, np.float64)
        if agg_time == "daily":
            yield t, field
            continue
        key = group_key(t)
        if key != cur:
            if cur is not None:
                closed.add(cur)
                yield period_start(cur), (acc / count if agg_method == "mean" else acc)
            if key in closed:
                # Sorted input is a precondition (each period is reduced once,
                # in one pass); a reappearing period means out-of-order
                # timestamps or interleaved files and would silently produce
                # duplicate/split composites.
                raise ValueError(
                    f"period {key} reappeared after being closed; "
                    "aggregate_stream requires date-ordered input"
                )
            acc, count, cur = field.copy(), 1, key
        else:
            count += 1
            if agg_method == "mean" or agg_method == "sum":
                acc += field
            elif agg_method == "max":
                np.maximum(acc, field, out=acc)
            else:
                np.minimum(acc, field, out=acc)
    if cur is not None:
        yield period_start(cur), (acc / count if agg_method == "mean" else acc)


def compute_global_stats(
    store_path: str,
    variable: str,
    model: str,
    crop_region: Optional[Sequence[int]] = None,
    num_workers: int = 8,
) -> Dict[str, float]:
    """Stream a store's daily fields into global stats (reference :215-292)."""
    group = zarrlite.open_group(store_path)
    keys = group.keys()
    if not keys:
        raise ValueError(f"Empty store: {store_path}")
    stats = StreamingStats()

    def load(key: str) -> np.ndarray:
        field = extract_2d(group, key, variable)
        field = correct_variable_units(variable, model, field)
        if crop_region is not None:
            x1, x2, y1, y2 = crop_region
            field = field[x1:x2, y1:y2]
        return field

    with cf.ThreadPoolExecutor(max_workers=num_workers) as pool:
        for field in pool.map(load, keys):
            stats.update(field)
    return stats.finalize()


def write_stats_json(
    stats: Mapping[str, float],
    stats_root: str,
    model: str,
    variable: str,
    domain_str: str,
    crop_region_str: str,
    split: str,
) -> str:
    path = T.stats_path(stats_root, model, variable, domain_str, crop_region_str, split)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(dict(stats), f, indent=2)
    logger.info("wrote %s", path)
    return path


def run_data_statistics(
    cfg: Config,
    splits: Sequence[str] = ("all",),
    num_workers: Optional[int] = None,
) -> Dict[str, Dict[str, float]]:
    """Compute + persist stats for the HR variable and every LR condition.

    For each variable two stats files are written: the full domain and (when
    cutouts are configured) the cutout crop region — matching the pair of
    crop-region strings the dataset resolves at train time.
    """
    num_workers = num_workers or cfg.data_handling.num_workers
    jobs: Iterable[Tuple[str, str, Optional[Tuple[int, ...]], Tuple[int, int]]] = []
    jobs = [
        (
            cfg.highres.model,
            cfg.highres.variable,
            tuple(cfg.highres.cutout_domains) if cfg.highres.cutout_domains else None,
            tuple(cfg.highres.full_domain_dims),
        )
    ] + [
        (
            cfg.lowres.model,
            var,
            tuple(cfg.lowres.cutout_domains) if cfg.lowres.cutout_domains else None,
            tuple(cfg.lowres.full_domain_dims),
        )
        for var in (cfg.lowres.condition_variables or ())
    ]
    stats_root = cfg.paths.stats_load_dir
    results = {}
    for split in splits:
        for model, var, crop, dims in jobs:
            store = build_data_path(cfg.paths.data_dir, model, var, dims, split)
            domain_str = f"{dims[0]}x{dims[1]}"
            regions = {"full": None}
            if crop is not None:
                regions["_".join(map(str, crop))] = crop
            for crop_str, crop_region in regions.items():
                stats = compute_global_stats(
                    store, var, model, crop_region, num_workers
                )
                write_stats_json(
                    stats, stats_root, model, var, domain_str, crop_str, split
                )
                results[f"{model}/{var}/{crop_str}/{split}"] = stats
    return results
