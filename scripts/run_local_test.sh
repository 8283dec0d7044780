#!/usr/bin/env bash
# CPU smoke test on synthetic data (reference bash_scripts/run_local_test.sh).
set -euo pipefail
cd "$(dirname "$0")/.."
export JAX_PLATFORMS=cpu
export SBGM_FORCE_CPU=1   # env var alone is overridden by the pinned platform
python -m sbgm_danra_tpu.cli.main_app --config_path configs/debug.yaml \
    --mode synthetic_data --n_days 32
python -m sbgm_danra_tpu.cli.main_app --config_path configs/debug.yaml \
    --mode full_pipeline training.epochs=1 training.steps_per_epoch=4 \
    evaluation.n_steps=10 "$@"
