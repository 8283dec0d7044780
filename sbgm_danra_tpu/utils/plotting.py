"""Figure helpers (reference sbgm/utils.py:831-1626, reduced to the load-bearing
plots: conditions + truth + generated grids, loss curves)."""

from __future__ import annotations

from typing import Dict, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from sbgm_danra_tpu.utils.units import VARIABLE_REGISTRY


def _squeeze_geo(value: np.ndarray) -> np.ndarray:
    """Strip the CFG mask channel from a value||mask geo map
    (reference _squeeze_geo_value, utils.py:43-51)."""
    v = np.asarray(value)
    if v.ndim == 3 and v.shape[-1] == 2:
        return v[..., 0]
    if v.ndim == 3 and v.shape[-1] == 1:
        return v[..., 0]
    return v


def plot_samples_and_generated(batch: Dict, generated: np.ndarray, cfg=None):
    """Rows: LR conditions, geo, HR truth, generated; columns: samples
    (reference plot_samples_and_generated, utils.py:1404-1626)."""
    x = np.asarray(batch["x"])
    n = min(x.shape[0], 8)
    rows = [("truth", x[..., 0]), ("generated", np.asarray(generated))]
    cond = batch.get("cond_img")
    if cond is not None:
        cond = np.asarray(cond)
        for c in range(cond.shape[-1]):
            rows.insert(0, (f"cond{c}", cond[..., c]))
    for geo_key in ("lsm_cond", "topo_cond"):
        if batch.get(geo_key) is not None:
            rows.insert(-2, (geo_key, np.stack([_squeeze_geo(v) for v in np.asarray(batch[geo_key])])))
    fig, axes = plt.subplots(
        len(rows), n, figsize=(2.2 * n, 2.2 * len(rows)), squeeze=False
    )
    for r, (name, data) in enumerate(rows):
        for i in range(n):
            img = data[min(i, data.shape[0] - 1)]
            axes[r][i].imshow(img)
            if i == 0:
                axes[r][i].set_ylabel(name, fontsize=8)
            axes[r][i].set_xticks([])
            axes[r][i].set_yticks([])
    fig.tight_layout()
    return fig


def plot_losses(history: Dict, path: Optional[str] = None):
    """Train/val loss curves (reference training.py:486-499)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    for key in ("train_loss", "val_loss"):
        if history.get(key):
            ax.plot(history[key], label=key)
    ax.set_xlabel("epoch")
    ax.set_ylabel("DSM loss")
    ax.set_yscale("log")
    ax.legend()
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150)
        plt.close(fig)
    return fig


def cmap_for(var: str) -> str:
    return VARIABLE_REGISTRY.get(var, {}).get("cmap", "viridis")


def plot_sample(
    field: np.ndarray,
    var: str = "temp",
    lsm: Optional[np.ndarray] = None,
    mask_ocean: bool = False,
    title: Optional[str] = None,
    path: Optional[str] = None,
):
    """Single field with colorbar, optional ocean masking (reference
    plot_sample, utils.py:831)."""
    field = np.asarray(field).squeeze()
    if mask_ocean and lsm is not None:
        field = np.where(np.asarray(lsm).squeeze() > 0.5, field, np.nan)
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(field, cmap=cmap_for(var))
    unit = VARIABLE_REGISTRY.get(var, {}).get("unit", "")
    fig.colorbar(im, ax=ax, label=unit)
    ax.set_title(title or VARIABLE_REGISTRY.get(var, {}).get("long_name", var))
    ax.set_xticks([])
    ax.set_yticks([])
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150)
        plt.close(fig)
    return fig


def plot_sample_with_boxplot(
    field: np.ndarray,
    var: str = "temp",
    lsm: Optional[np.ndarray] = None,
    mask_ocean: bool = False,
    path: Optional[str] = None,
):
    """Field map + value-distribution boxplot side by side (reference
    plot_sample_with_boxplot, utils.py:1016)."""
    field = np.asarray(field).squeeze()
    values = field
    if mask_ocean and lsm is not None:
        masked = np.where(np.asarray(lsm).squeeze() > 0.5, field, np.nan)
        values = masked[np.isfinite(masked)]
        field = masked
    fig, (ax_map, ax_box) = plt.subplots(
        1, 2, figsize=(8, 4), gridspec_kw={"width_ratios": [3, 1]}
    )
    im = ax_map.imshow(field, cmap=cmap_for(var))
    fig.colorbar(im, ax=ax_map, label=VARIABLE_REGISTRY.get(var, {}).get("unit", ""))
    ax_map.set_xticks([])
    ax_map.set_yticks([])
    ax_box.boxplot(np.asarray(values).ravel()[~np.isnan(np.asarray(values).ravel())])
    ax_box.set_xticks([])
    fig.tight_layout()
    if path:
        fig.savefig(path, dpi=150)
        plt.close(fig)
    return fig
