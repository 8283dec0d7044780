"""Run the PC-vs-EDM sampler quality study and print the BASELINE.md table.

Exact-score synthetic regimes (no trained model => no model-error confound);
see sbgm_danra_tpu/evaluate/quality_study.py.

Usage: python scripts/edm_quality_study.py [--members 64] [--truths 256]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# CPU-only workload (tiny fields, exact scores) — never contend for the TPU.
# The session sitecustomize pins the axon platform imperatively, so the env
# var alone is not enough (CLAUDE.md).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from sbgm_danra_tpu.evaluate.quality_study import format_table, run_study


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--members", type=int, default=64)
    ap.add_argument("--truths", type=int, default=256)
    ap.add_argument("--size", type=int, default=16)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    results = run_study(
        n_members=args.members, size=args.size, n_truths=args.truths, seed=args.seed
    )
    print(format_table(results))
    print()
    print(json.dumps(results))


if __name__ == "__main__":
    main()
