"""Unified pipeline CLI (reference sbgm/cli/main_app.py:42-88).

    python -m sbgm_danra_tpu.cli.main_app --config_path cfg.yaml \
        --mode {train,generate,evaluate,full_pipeline,data_splits,synthetic_data} \
        [--skip_training] [--skip_generation] [overrides key=value ...]

Existence gates mirror the reference: generation is skipped unless a trained
checkpoint exists (check_model_exists, main_app.py:30) and evaluation is
skipped unless generated samples exist (check_generated_samples_exist, :35).
"""

from __future__ import annotations

import argparse
import glob
import logging
import os
import sys

from sbgm_danra_tpu.config import Config, load_config, parse_override
from sbgm_danra_tpu.utils.naming import get_model_string

logger = logging.getLogger(__name__)


def check_model_exists(cfg: Config) -> bool:
    ckpt_dir = os.path.join(cfg.paths.checkpoint_dir, get_model_string(cfg))
    return os.path.isdir(ckpt_dir) and bool(os.listdir(ckpt_dir))


def check_generated_samples_exist(cfg: Config) -> bool:
    sample_path = os.path.join(
        cfg.paths.sample_dir, "generation", get_model_string(cfg), "generated_samples"
    )
    return bool(glob.glob(os.path.join(sample_path, "gen_samples_*.npz")))


def run_mode(cfg: Config, mode: str, args) -> None:
    from sbgm_danra_tpu.cli import entries

    if mode == "train":
        entries.train_main(cfg)
    elif mode == "generate":
        if not check_model_exists(cfg):
            raise SystemExit(
                "No trained checkpoint found — run --mode train first "
                f"(looked under {cfg.paths.checkpoint_dir})"
            )
        entries.generation_main(cfg)
    elif mode == "evaluate":
        if not check_generated_samples_exist(cfg):
            raise SystemExit(
                "No generated samples found — run --mode generate first"
            )
        entries.evaluation_main(cfg)
    elif mode == "data_splits":
        from sbgm_danra_tpu.pipelines.splits import create_splits_from_config

        create_splits_from_config(cfg)
    elif mode == "run_statistics":
        from sbgm_danra_tpu.pipelines.stats_pipeline import run_data_statistics

        run_data_statistics(cfg)
    elif mode == "synthetic_data":
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate

        # generate every variable the config trains on: the HR target plus
        # all LR conditioning variables (10 for configs/all_data.yaml)
        variables = tuple(dict.fromkeys(
            [cfg.highres.variable, *(cfg.lowres.condition_variables or ())]
        ))
        spec = SyntheticSpec(
            root=cfg.paths.data_dir,
            full_domain=tuple(cfg.highres.full_domain_dims),
            n_days=args.n_days,
            variables=variables,
            crop_region=tuple(cfg.highres.cutout_domains)
            if cfg.highres.cutout_domains
            else None,
        )
        if args.no_all_split:
            # train/valid/test only: the 'all' split duplicates every field
            # (2x write volume) and is needed only by the data-analysis modes
            spec.splits = {
                k: v for k, v in spec.resolved_splits().items() if k != "all"
            }
        written = generate(spec)
        logger.info("synthetic data written under %s", cfg.paths.data_dir)
        for k, v in written.items():
            logger.info("  %s: %s", k, v)
    elif mode == "full_pipeline":
        if not args.skip_training:
            entries.train_main(cfg)
        if not args.skip_generation:
            if check_model_exists(cfg):
                entries.generation_main(cfg)
            else:
                logger.warning("skipping generation: no checkpoint found")
        if not args.skip_evaluation:
            if check_generated_samples_exist(cfg):
                entries.evaluation_main(cfg)
            else:
                logger.warning("skipping evaluation: no generated samples found")
    else:
        raise SystemExit(f"Unknown mode: {mode}")


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="SBGM DANRA TPU pipeline")
    parser.add_argument("--config_path", required=True)
    parser.add_argument(
        "--mode",
        default="full_pipeline",
        choices=[
            "train", "generate", "evaluate", "full_pipeline",
            "data_splits", "run_statistics", "synthetic_data",
        ],
    )
    parser.add_argument("--skip_training", action="store_true")
    parser.add_argument("--skip_generation", action="store_true")
    parser.add_argument("--skip_evaluation", action="store_true")
    parser.add_argument("--n_days", type=int, default=64, help="synthetic_data days")
    parser.add_argument("--no_all_split", action="store_true",
                        help="synthetic_data: skip the duplicate 'all' split")
    parser.add_argument(
        "overrides", nargs="*", help="dot-key config overrides, e.g. training.epochs=3"
    )
    args = parser.parse_args(argv)

    from sbgm_danra_tpu.utils.jax_env import setup_jax_env

    setup_jax_env()

    # kill -USR1 <pid> dumps every thread's Python stack to stderr — the only
    # way to see where a long remote compile / stalled run is without a
    # debugger in this image.
    import faulthandler
    import signal

    faulthandler.register(signal.SIGUSR1, all_threads=True)

    logging.basicConfig(level=logging.INFO)
    overrides = dict(parse_override(s) for s in args.overrides)
    cfg = load_config(args.config_path, overrides)
    run_mode(cfg, args.mode, args)


if __name__ == "__main__":
    main()
