"""Mode entry functions: train / generate / evaluate.

Analogues of the reference's training_main.py:15-176, generation_main.py:47-143
and evaluation_main.py:45-116, wired to the TPU-native stack.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Optional

import jax
import numpy as np

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.data.factory import make_loaders
from sbgm_danra_tpu.evaluate.evaluation import Evaluation
from sbgm_danra_tpu.evaluate.generation import SampleGenerator
from sbgm_danra_tpu.training.pipeline import TrainingPipeline
from sbgm_danra_tpu.transforms import build_back_transforms_from_stats
from sbgm_danra_tpu.utils.logging_utils import setup_logger
from sbgm_danra_tpu.utils.naming import get_model_string
from sbgm_danra_tpu.utils.plotting import plot_losses

logger = logging.getLogger(__name__)


def _back_transforms(cfg: Config):
    """Stats-driven inverse transforms keyed {var}_hr/{cond}_lr/generated."""
    hr, lr = cfg.highres, cfg.lowres
    cutouts = cfg.transforms.sample_w_cutouts
    try:
        return build_back_transforms_from_stats(
            hr_var=hr.variable,
            hr_model=hr.model,
            domain_str_hr=f"{hr.full_domain_dims[0]}x{hr.full_domain_dims[1]}",
            crop_region_str_hr="_".join(map(str, hr.cutout_domains))
            if (cutouts and hr.cutout_domains)
            else "full",
            hr_scaling_method=hr.scaling_method,
            hr_buffer_frac=hr.buffer_frac,
            lr_vars=list(lr.condition_variables or ()),
            lr_model=lr.model,
            domain_str_lr=f"{lr.full_domain_dims[0]}x{lr.full_domain_dims[1]}",
            crop_region_str_lr="_".join(map(str, lr.cutout_domains))
            if (cutouts and lr.cutout_domains)
            else "full",
            lr_scaling_methods=list(lr.scaling_methods or ()),
            lr_buffer_frac=lr.buffer_frac,
            split="all",
            stats_dir_root=cfg.paths.stats_load_dir,
        )
    except FileNotFoundError as e:
        logger.warning("Back transforms unavailable (%s); proceeding without.", e)
        return {}


def _maybe_mesh(cfg: Config):
    n_dev = len(jax.devices())
    if cfg.parallel.mesh_shape is None and n_dev <= 1:
        return None
    if cfg.training.batch_size % n_dev != 0:
        logger.warning(
            "batch_size %d not divisible by %d devices; running single-device "
            "(set parallel.mesh_shape or a divisible batch for DP)",
            cfg.training.batch_size, n_dev,
        )
        return None
    from sbgm_danra_tpu.parallel.mesh import mesh_from_config

    try:
        return mesh_from_config(cfg)
    except ValueError as e:
        logger.warning("Mesh construction failed (%s); running single-device.", e)
        return None


def train_main(cfg: Config) -> TrainingPipeline:
    setup_logger(log_dir=os.path.join(cfg.paths.sample_dir, "logs"))
    # per-run frozen config dump (the trial-YAML pattern, run_optuna.py:190-192)
    cfg.dump(os.path.join(cfg.paths.sample_dir, f"config_{get_model_string(cfg)}.yaml"))

    train_loader, valid_loader, gen_loader = make_loaders(cfg)

    # loader throughput probe (reference training_main.py:58-63)
    if cfg.training.verbose:
        t0 = time.time()
        n_probe = 0
        for _ in zip(range(5), iter(train_loader)):
            n_probe += 1
        if n_probe:
            logger.info(
                "loader probe: %.3f s/batch over %d batches",
                (time.time() - t0) / n_probe, n_probe,
            )

    # initial sample-batch grid (reference training_main.py:66 "Saved initial
    # sample plot"; rows = samples, columns = HR/LR/geo/sdf keys)
    if cfg.visualization.plot_initial_sample:
        from sbgm_danra_tpu.utils.plotting import plot_batch_grid

        # raw collated batch: reference-style keys ({var}_hr/{var}_lr/lsm/topo/sdf)
        batch = next(iter(train_loader))
        fig_dir = os.path.join(cfg.paths.sample_dir, "figures")
        os.makedirs(fig_dir, exist_ok=True)
        path = os.path.join(fig_dir, "initial_sample_plot.png")
        plot_batch_grid(batch, hr_var=cfg.highres.variable, path=path)
        logger.info("Saved initial sample plot to %s", path)

    back_transforms = _back_transforms(cfg)
    mesh = _maybe_mesh(cfg)
    pipeline = TrainingPipeline(
        cfg, train_loader, valid_loader, back_transforms=back_transforms, mesh=mesh,
        gen_loader=gen_loader if cfg.visualization.preview_every else None,
    )
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(pipeline.state.params))
    logger.info("model %s: %s params", pipeline.model_string, f"{n_params:,}")

    if cfg.training.load_checkpoint:
        try:
            pipeline.load()
            logger.info("resumed from epoch %d", pipeline.epoch)
        except FileNotFoundError:
            logger.info("no checkpoint to resume from; training from scratch")

    pipeline.train()
    if cfg.visualization.plot_losses:
        plot_losses(
            pipeline.history,
            os.path.join(cfg.paths.sample_dir, f"losses_{pipeline.model_string}.png"),
        )
    return pipeline


def _load_pipeline_for_sampling(cfg: Config):
    """Rebuild the model and load the best checkpoint (reference
    generation_main.py:72-76)."""
    import copy

    # Sampling-only pipelines never run the fused train scan; drop the knob so
    # serving/generation work with host loaders (the fused guard requires a
    # device-resident train loader, training/pipeline.py).
    cfg = copy.deepcopy(cfg)
    cfg.training.fused_steps = 0
    train_loader, _, gen_loader = make_loaders(cfg)
    pipeline = TrainingPipeline(cfg, train_loader, None, mesh=None)
    pipeline.load(best=True)
    return pipeline, gen_loader


def generation_main(cfg: Config) -> None:
    setup_logger(log_dir=os.path.join(cfg.paths.sample_dir, "logs"))
    pipeline, gen_loader = _load_pipeline_for_sampling(cfg)
    back_transforms = _back_transforms(cfg)
    mesh = _maybe_mesh(cfg)
    generator = SampleGenerator(
        cfg,
        pipeline.score_fn(use_ema=cfg.training.load_ema),
        gen_loader,
        back_transforms=back_transforms,
        mesh=mesh,
    )
    gen_types = cfg.evaluation.gen_type
    if isinstance(gen_types, str):
        gen_types = (gen_types,)
    for gen_type in gen_types:
        logger.info("generation mode: %s", gen_type)
        if gen_type == "multiple":
            generator.generate_multiple()
        elif gen_type == "single":
            generator.generate_single()
        elif gen_type == "repeated":
            generator.generate_repeated()
        elif gen_type == "full_domain":
            # dedicated loader: full-field conditioning, training-crop stats
            from sbgm_danra_tpu.data.factory import make_dataset
            from sbgm_danra_tpu.data.loader import DataLoader

            fd_loader = DataLoader(
                make_dataset(cfg, "test", full_domain=True),
                batch_size=cfg.evaluation.n_full_domain_samples,
                shuffle=False,
                drop_last=False,
                num_workers=cfg.data_handling.num_workers,
                seed=cfg.evaluation.seed,
            )
            SampleGenerator(
                cfg,
                pipeline.score_fn(
                    use_ema=cfg.training.load_ema,
                    image_hw=tuple(cfg.highres.full_domain_dims),
                ),
                fd_loader,
                back_transforms=back_transforms,
                mesh=mesh,
            ).generate_full_domain()
        else:
            raise ValueError(f"Unknown gen_type: {gen_type}")


def evaluation_main(cfg: Config) -> None:
    setup_logger(log_dir=os.path.join(cfg.paths.sample_dir, "logs"))
    gen_types = cfg.evaluation.gen_type
    if isinstance(gen_types, str):
        gen_types = (gen_types,)
    for gen_type in gen_types:
        if gen_type == "repeated":
            n = cfg.evaluation.n_repeats
        elif gen_type == "multiple":
            n = cfg.data_handling.n_gen_samples
        else:
            n = 1
        ev = Evaluation(cfg, generated_sample_type=gen_type, n_samples=n)
        for method in cfg.evaluation.eval_stat_methods:
            if method == "pixel_stats":
                stats = ev.full_pixel_statistics()
                logger.info(
                    "%s pixel stats: rmse %.4f mae %.4f", gen_type,
                    stats["rmse_per_sample"].mean(), stats["abs_error_per_sample"].mean(),
                )
            elif method == "spatial_stats":
                ev.spatial_statistics()
            elif method == "power_spectrum":
                sp = ev.power_spectrum_comparison()
                logger.info(
                    "%s spectrum: logMSE %.4f (ratio at finest resolved scale %.3f)",
                    gen_type, sp["log_mse"], sp["ratio"][-2],
                )
            elif method == "crps" and gen_type == "repeated":
                scores = ev.ensemble_crps()
                logger.info("ensemble CRPS %.4f rmse %.4f spread %.4f",
                            scores["crps"], scores["ensemble_mean_rmse"], scores["spread"])
        ev.plot_example_images(mask_ocean=cfg.evaluation.mask_ocean)
