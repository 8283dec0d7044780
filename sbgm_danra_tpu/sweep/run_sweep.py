"""Sweep runner: search spaces + objective over the training pipeline.

Mirrors the reference's Optuna harness (sbgm/sweep/run_optuna.py):

- high-impact space (:114-132): learning rate (log-uniform; note the reference
  writes it to a typo'd key 'training.leargning_rate' so its lr suggestion is
  silently DROPPED — fixed here), optimizer, n_timesteps, time embedding,
  CFG guidance scale, block layers, attention heads;
- medium-impact space (:134-144): batch size, ema decay, weight decay,
  last_fmap_channels;
- per-trial frozen config dump to sweep/generated/trial_NNNNN.yaml (:190-192);
- shared sqlite study so SLURM-array-style workers each run one trial (:15-19);
- SuccessiveHalving pruning on per-epoch validation loss (:278-286, :242-258).
"""

from __future__ import annotations

import copy
import logging
import os
from typing import Any, Dict, Optional

from sbgm_danra_tpu.config import Config, deep_update, from_dict, load_config
from sbgm_danra_tpu.sweep.study import (
    GPSampler,
    HaltonSampler,
    Study,
    SuccessiveHalvingPruner,
    Trial,
    TrialPruned,
)

logger = logging.getLogger(__name__)


def sample_high_impact(trial: Trial) -> Dict[str, Any]:
    """High-impact search space (reference run_optuna.py:114-132)."""
    return {
        "training.learning_rate": trial.suggest_float("learning_rate", 1e-5, 3e-3, log=True),
        "training.optimizer": trial.suggest_categorical("optimizer", ["adam", "adamw"]),
        "sampler.n_timesteps": trial.suggest_int("n_timesteps", 200, 1500),
        "sampler.time_embedding": trial.suggest_categorical("time_embedding", [128, 256, 512]),
        "classifier_free_guidance.guidance_scale": trial.suggest_float(
            "guidance_scale", 0.5, 8.0
        ),
        "sampler.block_layers": trial.suggest_categorical(
            "block_layers", [(1, 1, 1, 1), (2, 2, 2, 2), (3, 3, 3, 3)]
        ),
        "sampler.num_heads": trial.suggest_categorical("num_heads", [2, 4, 8]),
    }


def sample_medium_impact(trial: Trial) -> Dict[str, Any]:
    """Medium-impact space (reference run_optuna.py:134-144)."""
    return {
        "training.batch_size": trial.suggest_categorical("batch_size", [8, 16, 32]),
        "training.ema_decay": trial.suggest_float("ema_decay", 0.99, 0.9999, log=True),
        "training.weight_decay": trial.suggest_float("weight_decay", 1e-8, 1e-4, log=True),
        "sampler.last_fmap_channels": trial.suggest_categorical(
            "last_fmap_channels", [256, 512]
        ),
    }


def build_trial_config(
    base: Dict[str, Any], trial: Trial, include_medium: bool = False,
    out_dir: Optional[str] = None,
) -> Config:
    raw = copy.deepcopy(base)
    updates = sample_high_impact(trial)
    if include_medium:
        updates.update(sample_medium_impact(trial))
    deep_update(raw, updates)
    cfg = from_dict(raw)
    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
        cfg.dump(os.path.join(out_dir, f"trial_{trial.trial_id:05d}.yaml"))
    return cfg


def make_objective(
    base_config: Dict[str, Any],
    epochs: int = 5,
    steps_per_epoch: Optional[int] = None,
    include_medium: bool = False,
    generated_dir: Optional[str] = None,
):
    """Objective: short training run, report per-epoch val loss, allow pruning.

    Broken architectures (e.g. incompatible width/head combinations) are pruned
    instead of failing the study — the reference's AssertionError-prune pattern
    (run_optuna.py:236-239).
    """

    def objective(trial: Trial) -> float:
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline

        cfg = build_trial_config(base_config, trial, include_medium, generated_dir)
        try:
            train_loader, valid_loader, _ = make_loaders(cfg)
            pipeline = TrainingPipeline(cfg, train_loader, valid_loader)
        except (ValueError, AssertionError) as e:
            logger.warning("trial %d: broken architecture (%s); pruned", trial.trial_id, e)
            raise TrialPruned() from e

        best = float("inf")

        def on_epoch_end(pipe, epoch, train_loss, val_loss):
            nonlocal best
            monitored = val_loss if val_loss == val_loss else train_loss
            best = min(best, monitored)
            trial.report(monitored, step=epoch)
            if trial.should_prune(step=epoch):
                raise TrialPruned()

        pipeline.train(
            epochs=epochs, steps_per_epoch=steps_per_epoch, on_epoch_end=on_epoch_end
        )
        return best

    return objective


def run_sweep(
    config_path: str,
    storage_path: str,
    n_trials: int = 1,
    epochs: int = 5,
    steps_per_epoch: Optional[int] = None,
    include_medium: bool = False,
    seed: int = 42,
) -> Study:
    """One worker's share of the study; N workers share storage_path."""
    import yaml

    from sbgm_danra_tpu.config import resolve_env

    with open(config_path) as f:
        base = resolve_env(yaml.safe_load(f))
    # GP expected-improvement after a Halton startup phase — the reference's
    # GPSampler choice (run_optuna.py:278-286)
    study = Study(
        storage_path,
        sampler=GPSampler(seed=seed),
        pruner=SuccessiveHalvingPruner(min_resource=1, reduction_factor=4),
        load_if_exists=True,
    )
    generated = os.path.join(os.path.dirname(storage_path), "generated")
    study.optimize(
        make_objective(base, epochs, steps_per_epoch, include_medium, generated),
        n_trials=n_trials,
    )
    return study


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(description="hyperparameter sweep worker")
    p.add_argument("--config_path", required=True)
    p.add_argument("--storage", required=True, help="shared sqlite study path")
    p.add_argument("--n_trials", type=int, default=1)
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--steps_per_epoch", type=int, default=None)
    p.add_argument("--medium", action="store_true")
    args = p.parse_args(argv)
    logging.basicConfig(level=logging.INFO)
    # persistent compile cache: re-visited architectures (GP exploitation
    # phase, resumed studies) skip the slow first compile
    from sbgm_danra_tpu.utils.jax_env import setup_jax_env

    setup_jax_env()
    study = run_sweep(
        args.config_path, args.storage, args.n_trials, args.epochs,
        args.steps_per_epoch, args.medium,
    )
    try:
        best = study.best_trial
        logger.info("best trial %d: %.5f %s", best["trial_id"], best["value"], best["params"])
    except ValueError:
        logger.info("no completed trials yet")


if __name__ == "__main__":
    main()
