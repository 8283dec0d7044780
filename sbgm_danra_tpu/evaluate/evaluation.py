"""Offline evaluation of saved generation artifacts.

Re-design of the reference Evaluation class (evaluate_sbgm/evaluation.py:16-444):
loads the npz artifacts written by SampleGenerator (by sample-type suffix) and
computes pixel/spatial statistics; adds ensemble CRPS (BASELINE parity — the
reference has no probabilistic metric at all).
"""

from __future__ import annotations

import logging
import os
from typing import Dict, Optional

import numpy as np

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.evaluate.crps import crps_ensemble
from sbgm_danra_tpu.utils.naming import get_model_string

logger = logging.getLogger(__name__)


class Evaluation:
    """Loads gen/eval/cond/lsm npz for one sample-type suffix."""

    def __init__(self, cfg: Config, generated_sample_type: str = "multiple", n_samples: int = 4):
        self.cfg = cfg
        self.sample_type = generated_sample_type
        self.model_string = get_model_string(cfg)
        self.output_dir = os.path.join(
            cfg.paths.sample_dir, "generation", self.model_string
        )
        self.sample_path = os.path.join(self.output_dir, "generated_samples")
        self.fig_path = os.path.join(self.output_dir, "evaluation_figures")
        os.makedirs(self.fig_path, exist_ok=True)

        # suffix convention (reference evaluation.py:60-75)
        if generated_sample_type == "repeated":
            suffix = f"_repeated_{n_samples}.npz"
        elif generated_sample_type == "single":
            suffix = "_single.npz"
        elif generated_sample_type == "full_domain":
            suffix = "_full_domain.npz"
        else:
            suffix = f"_multi_n_{n_samples}.npz"
        self.suffix = suffix

        self.gen_imgs = self._load("gen_samples")
        self.eval_imgs = self._load("eval_samples")
        self.lsm_imgs = self._load("lsm_samples", required=False)
        self.seasons = self._load("seasons", required=False)
        self.cond_imgs = {}
        for var in cfg.lowres.condition_variables or ():
            arr = self._load(f"cond_samples_{var}", required=False)
            if arr is not None:
                self.cond_imgs[var] = arr

    def _load(self, key: str, required: bool = True) -> Optional[np.ndarray]:
        path = os.path.join(self.sample_path, key + self.suffix)
        if not os.path.exists(path):
            if required:
                raise FileNotFoundError(f"Missing generation artifact: {path}")
            return None
        return np.load(path)["arr_0"]

    # -- metrics ---------------------------------------------------------------

    def full_pixel_statistics(
        self, save_stats: bool = True, save_figs: bool = True
    ) -> Dict[str, np.ndarray]:
        """Pooled value distributions, per-sample |bias|/RMSE, per-pixel error
        arrays, plus the reference's two figures: pooled value histograms and
        the per-pixel RMSE/MAE histograms (reference evaluation.py:266-369)."""
        gen = self.gen_imgs.reshape(self.gen_imgs.shape[0], -1)
        ref = self.eval_imgs.reshape(self.eval_imgs.shape[0], -1)
        if ref.shape[0] == 1 and gen.shape[0] > 1:
            ref = np.repeat(ref, gen.shape[0], axis=0)
        err = gen - ref
        stats = {
            "gen_values": gen.ravel(),
            "eval_values": ref.ravel(),
            "abs_error_per_sample": np.abs(err).mean(axis=1),
            "rmse_per_sample": np.sqrt((err**2).mean(axis=1)),
            "bias_per_sample": err.mean(axis=1),
            # per-pixel flattened errors (reference mae_all/rmse_all, :336-337)
            "mae_all": np.abs(err).ravel(),
            "rmse_all": np.abs(err).ravel(),  # sqrt(square(x)) == |x| pointwise
        }
        if save_stats:
            out = os.path.join(
                self.fig_path, f"pixel_stats_{self.sample_type}.npz"
            )
            np.savez_compressed(out, **stats)
            logger.info("Saved pixel statistics to %s", out)
        if save_figs:
            from sbgm_danra_tpu.utils.plotting import (
                plot_error_histograms, plot_pixel_histograms,
            )
            from sbgm_danra_tpu.utils.units import VARIABLE_REGISTRY

            unit = VARIABLE_REGISTRY.get(
                self.cfg.highres.variable, {}
            ).get("unit", "")
            plot_pixel_histograms(
                stats["gen_values"], stats["eval_values"], unit,
                path=os.path.join(
                    self.fig_path, f"pixel_hist_{self.sample_type}.png"
                ),
            )
            plot_error_histograms(
                stats["mae_all"], stats["rmse_all"],
                path=os.path.join(
                    self.fig_path, f"rmse_mae_hist_{self.sample_type}.png"
                ),
            )
        return stats

    def spatial_statistics(self, save_stats: bool = True) -> Dict[str, np.ndarray]:
        """Per-pixel RMSE/MAE/bias maps (reference evaluation.py:392-443)."""
        gen, ref = self.gen_imgs, self.eval_imgs
        if ref.shape[0] == 1 and gen.shape[0] > 1:
            ref = np.repeat(ref, gen.shape[0], axis=0)
        err = gen - ref
        stats = {
            "rmse_map": np.sqrt((err**2).mean(axis=0)),
            "mae_map": np.abs(err).mean(axis=0),
            "bias_map": err.mean(axis=0),
        }
        if save_stats:
            out = os.path.join(self.fig_path, f"spatial_stats_{self.sample_type}.npz")
            np.savez_compressed(out, **stats)
        return stats

    def daily_statistics(self) -> Dict[str, np.ndarray]:
        """Per-sample summary series (the reference computes these and returns
        nothing, evaluation.py:375-387; here they are returned)."""
        axes = tuple(range(1, self.gen_imgs.ndim))
        return {
            "gen_mean": self.gen_imgs.mean(axis=axes),
            "gen_max": self.gen_imgs.max(axis=axes),
            "eval_mean": self.eval_imgs.mean(axis=axes),
            "eval_max": self.eval_imgs.max(axis=axes),
        }

    def ensemble_crps(self) -> Dict[str, float]:
        """Ensemble CRPS vs the (single) truth — only for 'repeated' artifacts."""
        if self.sample_type != "repeated":
            raise ValueError("CRPS needs a repeated (ensemble) artifact")
        obs = self.eval_imgs[0] if self.eval_imgs.ndim == self.gen_imgs.ndim else self.eval_imgs
        crps_map = crps_ensemble(self.gen_imgs, obs)
        members_mean = self.gen_imgs.mean(axis=0)
        rmse = float(np.sqrt(((members_mean - obs) ** 2).mean()))
        spread = float(self.gen_imgs.std(axis=0).mean())
        return {
            "crps": float(crps_map.mean()),
            "ensemble_mean_rmse": rmse,
            "spread": spread,
        }

    def power_spectrum_comparison(self, dx_km: float = 2.5) -> Dict[str, object]:
        """Radially averaged power-spectrum comparison of generated vs truth —
        the scientifically meaningful sharpness check (does the generator carry
        realistic variance at fine wavelengths, or is it blurry?). Uses the
        comparison pipeline's estimator (reference compare_distributions.py)."""
        from sbgm_danra_tpu.pipelines.comparison import compare_power_spectra

        gen = [g for g in self.gen_imgs]
        ref = self.eval_imgs
        if ref.shape[0] == 1 and len(gen) > 1:
            ref = np.repeat(ref, len(gen), axis=0)
        out = compare_power_spectra(gen, [r for r in ref], dx_km).as_dict()
        return out

    def plot_example_images(self, n_samples: int = 4, mask_ocean: bool = False):
        """Truth/generated side-by-side grid (reference evaluation.py:121-262)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        n = min(n_samples, self.gen_imgs.shape[0])
        fig, axes = plt.subplots(2, n, figsize=(2.4 * n, 5), squeeze=False)
        for i in range(n):
            ref = self.eval_imgs[min(i, self.eval_imgs.shape[0] - 1)]
            gen = self.gen_imgs[i]
            if mask_ocean and self.lsm_imgs is not None:
                lsm = self.lsm_imgs[min(i, self.lsm_imgs.shape[0] - 1)]
                lsm = lsm[..., 0] if lsm.ndim == 3 else lsm
                ref = np.where(lsm > 0.5, ref, np.nan)
                gen = np.where(lsm > 0.5, gen, np.nan)
            axes[0][i].imshow(ref)
            axes[0][i].set_title("truth")
            axes[1][i].imshow(gen)
            axes[1][i].set_title("generated")
            for ax in (axes[0][i], axes[1][i]):
                ax.set_xticks([])
                ax.set_yticks([])
        path = os.path.join(self.fig_path, f"examples_{self.sample_type}.png")
        fig.savefig(path, dpi=150)
        plt.close(fig)
        return path
