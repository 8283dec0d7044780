#!/usr/bin/env bash
# train launcher (reference bash_scripts/run_train_lumi.sh analogue)
set -euo pipefail
source "$(dirname "$0")/env.sh"
python -m sbgm_danra_tpu.cli.main_app --config_path "$CONFIG" --mode train "$@"
