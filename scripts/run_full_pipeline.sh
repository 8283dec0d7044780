#!/usr/bin/env bash
# full pipeline launcher (reference bash_scripts/run_full_pipeline_lumi.sh analogue)
set -euo pipefail
source "$(dirname "$0")/env.sh"
python -m sbgm_danra_tpu.cli.main_app --config_path "$CONFIG" --mode full_pipeline "$@"
