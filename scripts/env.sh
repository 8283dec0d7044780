#!/usr/bin/env bash
# Shared environment for launchers — exports the variables the ${env:} config
# resolver consumes (the reference's bash_scripts pattern, SURVEY.md §2.6).
export ROOT_DIR="${ROOT_DIR:-$(cd "$(dirname "${BASH_SOURCE[0]}")/.." && pwd)}"
export DATA_DIR="${DATA_DIR:-$ROOT_DIR/data}"
export CKPT_DIR="${CKPT_DIR:-$ROOT_DIR/checkpoints}"
export SAMPLE_DIR="${SAMPLE_DIR:-$ROOT_DIR/samples}"
export STATS_DIR="${STATS_DIR:-$DATA_DIR/stats}"
export CONFIG="${CONFIG:-$ROOT_DIR/configs/default.yaml}"
mkdir -p "$DATA_DIR" "$CKPT_DIR" "$SAMPLE_DIR"
