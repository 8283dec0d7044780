"""Batch sample generation from a trained checkpoint.

Re-design of the reference's SampleGenerator (evaluate_sbgm/generation.py:40-314)
with identical npz artifact layout:

    {sample_dir}/generation/{model_string}/generated_samples/
        gen_samples_{suffix}.npz   eval_samples_{suffix}.npz
        lsm_samples_{suffix}.npz   seasons_{suffix}.npz
        cond_samples_{var}_{suffix}.npz
    suffix in {multi_n_{N}, single, repeated_{N}}
    {sample_dir}/generation/{model_string}/generated_figures/gen_samples_{suffix}.png

TPU-first: all three modes run the configured sampler as one compiled scan;
``generate_repeated`` uses member-sharded ensemble generation over the mesh
instead of the reference's sequential Python loop (generation.py:284).
"""

from __future__ import annotations

import logging
import os
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.data.loader import extract_batch
from sbgm_danra_tpu.parallel.ensemble import generate_ensemble
from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.utils.naming import get_model_string

logger = logging.getLogger(__name__)

_COND_KEYS = ("y", "cond_img", "lsm_cond", "topo_cond")


class SampleGenerator:
    def __init__(
        self,
        cfg: Config,
        score_fn: Callable,
        dataloader,
        back_transforms: Optional[Dict] = None,
        sde: Optional[VESDE] = None,
        mesh=None,
    ):
        self.cfg = cfg
        self.score_fn = score_fn
        self.dataloader = dataloader
        self.back_transforms = back_transforms or {}
        self.sde = sde or VESDE()
        self.mesh = mesh
        self.model_string = get_model_string(cfg)
        self.output_dir = os.path.join(cfg.paths.sample_dir, "generation", self.model_string)
        self.fig_path = os.path.join(self.output_dir, "generated_figures")
        self.sample_path = os.path.join(self.output_dir, "generated_samples")
        os.makedirs(self.fig_path, exist_ok=True)
        os.makedirs(self.sample_path, exist_ok=True)
        g = cfg.classifier_free_guidance
        self.sampler_config = SamplerConfig(
            num_steps=cfg.evaluation.n_steps,
            snr=cfg.sampler.snr,
            eps=cfg.sampler.t_eps,
            guidance_scale=g.guidance_scale if g.enabled else None,
            guidance_scale_max=g.guidance_scale_max,
            edm_rho=cfg.sampler.edm_rho,
            s_churn=cfg.sampler.s_churn,
        )
        self.sampler_name = cfg.sampler.sampler_type
        self.rng = jax.random.PRNGKey(cfg.evaluation.seed)

    # -- internals -------------------------------------------------------------

    def _next_batch(self) -> Dict[str, np.ndarray]:
        return extract_batch(next(iter(self.dataloader)), self.cfg.highres.variable)

    def _cond(self, batch: Dict[str, np.ndarray]) -> Dict[str, jnp.ndarray]:
        return {
            k: jnp.asarray(batch[k]) for k in _COND_KEYS if batch.get(k) is not None
        }

    def _sample_shape(self, n: int):
        s = self.cfg.highres.data_size
        rf = self.cfg.lowres.resize_factor
        return (n, s[0] // rf, s[1] // rf, 1)

    def _run_sampler(self, n: int, cond: Dict) -> np.ndarray:
        sampler = get_sampler(self.sampler_name)
        self.rng, key = jax.random.split(self.rng)
        run = jax.jit(
            lambda k, c: sampler(
                self.score_fn, k, self._sample_shape(n), self.sde, self.sampler_config, cond=c
            )
        )
        out = run(key, cond)
        return np.asarray(out)[..., 0]  # (N, H, W): channel squeezed like the reference

    def _apply_backtransforms(self, x, generated, cond_img):
        """Inverse-transform truth/generated/LR channels (reference :85-107)."""
        hr_key = f"{self.cfg.highres.variable}_hr"
        bt = self.back_transforms
        if hr_key in bt:
            x = np.asarray(bt[hr_key](x))
        if "generated" in bt:
            generated = np.asarray(bt["generated"](generated))
        if cond_img is not None:
            cond_vars = list(self.cfg.lowres.condition_variables or ())
            # cond_img channels follow sorted({var}_lr) key order from extract_batch
            sorted_keys = sorted(f"{v}_lr" for v in cond_vars)
            chans = []
            for i, key in enumerate(sorted_keys):
                c = cond_img[..., i]
                chans.append(np.asarray(bt[key](c)) if key in bt else c)
            cond_img = np.stack(chans, axis=-1)
        return x, generated, cond_img

    def _save_npz(self, data: Dict[str, Optional[np.ndarray]], suffix: str) -> None:
        for key, value in data.items():
            if value is None:
                continue
            path = os.path.join(self.sample_path, f"{key}_{suffix}.npz")
            np.savez_compressed(path, np.asarray(value))
            logger.info("Saved %s_%s to %s", key, suffix, path)

    def _plot(self, batch, generated, suffix):
        if not self.cfg.evaluation.save_figs:
            return
        try:
            from sbgm_danra_tpu.utils.plotting import plot_samples_and_generated

            fig = plot_samples_and_generated(batch, generated, self.cfg)
            fig.savefig(
                os.path.join(self.fig_path, f"gen_samples_{suffix}.png"), dpi=150
            )
            import matplotlib.pyplot as plt

            plt.close(fig)
        except Exception as e:  # plotting must never kill generation
            logger.warning("Plotting failed for %s: %s", suffix, e)

    def _finalize(self, batch, generated, suffix):
        self._plot(batch, generated, suffix)
        x = batch["x"][..., 0]
        cond_img = batch.get("cond_img")
        x_bt, gen_bt, cond_bt = self._apply_backtransforms(x, generated, cond_img)
        self._save_npz(
            {
                "gen_samples": gen_bt,
                "eval_samples": x_bt,
                "lsm_samples": batch.get("lsm_cond"),
                "seasons": batch.get("y"),
            },
            suffix,
        )
        if cond_bt is not None:
            sorted_keys = sorted(
                f"{v}_lr" for v in (self.cfg.lowres.condition_variables or ())
            )
            for i, key in enumerate(sorted_keys):
                var = key[: -len("_lr")]
                self._save_npz({f"cond_samples_{var}": cond_bt[..., i]}, suffix)
        return gen_bt

    # -- public modes (reference :183-314) --------------------------------------

    def generate_multiple(self) -> np.ndarray:
        """One batch of distinct conditions."""
        batch = self._next_batch()
        n = batch["x"].shape[0]
        generated = self._run_sampler(n, self._cond(batch))
        return self._finalize(batch, generated, f"multi_n_{n}")

    def generate_single(self) -> np.ndarray:
        batch = self._next_batch()
        batch = {k: (v[:1] if hasattr(v, "shape") and v.ndim > 0 else v) for k, v in batch.items()}
        generated = self._run_sampler(1, self._cond(batch))
        return self._finalize(batch, generated, "single")

    def generate_repeated(self, n_repeats: Optional[int] = None) -> np.ndarray:
        """Ensemble: N member draws of ONE condition, member axis mesh-sharded."""
        n_repeats = n_repeats or self.cfg.evaluation.n_repeats
        batch = self._next_batch()
        batch = {k: (v[:1] if hasattr(v, "shape") and v.ndim > 0 else v) for k, v in batch.items()}
        cond = self._cond(batch)
        self.rng, key = jax.random.split(self.rng)
        members = generate_ensemble(
            self.score_fn,
            key,
            n_members=n_repeats,
            sample_shape=self._sample_shape(1)[1:],
            cond=cond,
            sampler=self.sampler_name,
            sde=self.sde,
            config=self.sampler_config,
            mesh=self.mesh,
        )
        generated = np.asarray(members)[..., 0]  # (N, H, W)
        alpha = self.cfg.evaluation.spread_calibration
        if alpha is not None:
            # inflate/deflate members about the ensemble mean in normalized
            # space (before back-transform) — evaluate/calibration.py
            from sbgm_danra_tpu.evaluate.calibration import apply_spread_scale

            logger.info("Applying spread calibration alpha=%.4f to %d members",
                        alpha, n_repeats)
            generated = apply_spread_scale(generated, alpha)
        rep_batch = {
            k: (np.repeat(v, n_repeats, axis=0) if hasattr(v, "shape") and v.ndim > 0 else v)
            for k, v in batch.items()
        }
        return self._finalize(rep_batch, generated, f"repeated_{n_repeats}")

    def generate_full_domain(self) -> np.ndarray:
        """Whole-domain fields (no cutouts): pad the full-field conditioning to
        the /32 pyramid, run one compiled reverse scan at padded dims, crop
        back. Requires a loader built with ``make_dataset(..., full_domain=True)``
        — the workload the reference never attempts (its attention restriction
        exists precisely because it cannot, sbgm/score_unet.py:780)."""
        from sbgm_danra_tpu.evaluate.full_domain import sample_full_domain

        batch = self._next_batch()
        cond = self._cond(batch)
        domain_hw = tuple(batch["x"].shape[1:3])
        self.rng, key = jax.random.split(self.rng)
        generated = sample_full_domain(
            self.score_fn,
            key,
            cond,
            domain_hw=domain_hw,
            batch=batch["x"].shape[0],
            sde=self.sde,
            config=self.sampler_config,
            sampler=self.sampler_name,
        )  # (N, H, W), already cropped to the domain
        return self._finalize(batch, generated, "full_domain")
