#!/usr/bin/env bash
# Sweep worker: N concurrent invocations (e.g. one per SLURM array task or per
# TPU slice) share the sqlite study — the reference's run_optuna_sweep pattern.
set -euo pipefail
source "$(dirname "$0")/env.sh"
STORAGE="${STORAGE:-$SAMPLE_DIR/sweep/study.db}"
N_TRIALS="${N_TRIALS:-1}"
python -m sbgm_danra_tpu.sweep.run_sweep --config_path "$CONFIG" \
    --storage "$STORAGE" --n_trials "$N_TRIALS" "$@"
