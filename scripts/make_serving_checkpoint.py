"""Bootstrap a serving checkpoint without training.

Writes a random-init full-state checkpoint for a config so the serving path
(`sbgm_danra_tpu.serve` / `scripts/serve_bench.py`) can be exercised and its
latency measured without first paying a flagship training run. Serving
LATENCY is weight-independent (same program, same FLOPs), so p50/p95 numbers
from a random-init checkpoint are honest; sample QUALITY obviously is not —
quality evidence comes from trained checkpoints (BASELINE flagship tables).

The reference has no serving path at all; its generation entry loads
checkpoints the same way training wrote them
(/root/reference/sbgm/evaluate_sbgm/generation_main.py:72-76).

Usage:
  python scripts/make_serving_checkpoint.py --config configs/flagship_synth.yaml
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/flagship_synth.yaml")
    args = ap.parse_args()

    from sbgm_danra_tpu.utils.jax_env import setup_jax_env, stabilize_tpu_cache_key

    setup_jax_env()
    stabilize_tpu_cache_key()

    from sbgm_danra_tpu.config import load_config
    from sbgm_danra_tpu.data.factory import make_loaders
    from sbgm_danra_tpu.training.pipeline import TrainingPipeline

    cfg = load_config(args.config)
    # Host loader is enough for init shapes; skip staging the split into HBM.
    cfg.data_handling.device_dataset = False
    cfg.training.fused_steps = 0  # fused scan requires the device loader
    train_loader, _, _ = make_loaders(cfg)
    pipeline = TrainingPipeline(cfg, train_loader, None, mesh=None)
    # Large FINITE sentinel, not inf: json.dump would emit the non-standard
    # 'Infinity' token into the checkpoint meta/metrics files (ADVICE r4).
    # Any finite value keeps best_step() returning this lone checkpoint.
    pipeline.save(val_loss=1e30)
    pipeline.checkpoints.wait()
    step = pipeline.checkpoints.best_step()
    pipeline.checkpoints.close()
    print(f"wrote random-init checkpoint (step {step}) under "
          f"{cfg.paths.checkpoint_dir}")


if __name__ == "__main__":
    main()
