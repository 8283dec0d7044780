#!/usr/bin/env bash
# data-ops launcher (reference bash_scripts/run_stats_lumi.sh analogue)
set -euo pipefail
source "$(dirname "$0")/env.sh"
python -m sbgm_danra_tpu.cli.main_data_app --config_path "$CONFIG" --mode run_statistics "$@"
