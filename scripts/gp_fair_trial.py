"""GP-EI vs Halton-only HPO: the fair trial (VERDICT r3 weak-item 4).

Round 3 exercised the GP phase on hardware but could not say whether it HELPS:
with n_startup=8 of 10 trials, GP-EI proposed exactly twice and both proposals
were pruned at epoch 1 — the best trial was Halton. This script gives the GP
phase a real sample: two studies with the same objective, budget, trial count
and seed protocol —

  A) GPSampler(seed, n_startup=8): 8 Halton startup trials, then GP
     expected-improvement proposals (the reference's sampler choice,
     /root/reference/sbgm/sweep/run_optuna.py:278-286);
  B) HaltonSampler(seed): pure quasirandom control.

Both use the production SuccessiveHalving pruner. Reports best-so-far vs
trial index per study and the study DBs as artifacts.

Usage:
  python scripts/gp_fair_trial.py [--config configs/sweep_tpu.yaml]
      [--n_trials 20] [--epochs 3] [--steps_per_epoch 40]
      [--out_dir /tmp/sbgm_gp_fair]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("gp_fair_trial")


def best_so_far(trials):
    """(trial_index, best value up to and including it); pruned trials carry
    their last reported value — a prune IS an observation of a bad region."""
    curve, best = [], float("inf")
    for t in sorted(trials, key=lambda t: t["trial_id"]):
        v = t["value"]
        if v is not None:
            best = min(best, v)
        curve.append(round(best, 2) if best < float("inf") else None)
    return curve


def run_study(name, sampler, base, out_dir, n_trials, epochs, steps_per_epoch):
    from sbgm_danra_tpu.sweep.run_sweep import make_objective
    from sbgm_danra_tpu.sweep.study import Study, SuccessiveHalvingPruner

    db = os.path.join(out_dir, f"{name}.db")
    study = Study(
        db,
        sampler=sampler,
        pruner=SuccessiveHalvingPruner(min_resource=1, reduction_factor=4),
        load_if_exists=True,
    )
    done = len([t for t in study.trials if t["state"] != "running"])
    todo = max(0, n_trials - done)
    logger.info("study %s: %d done, %d to run", name, done, todo)
    t0 = time.time()
    if todo:
        study.optimize(
            make_objective(base, epochs, steps_per_epoch,
                           generated_dir=os.path.join(out_dir, f"{name}_generated")),
            n_trials=todo,
        )
    trials = study.trials
    complete = [t for t in trials if t["state"] == "complete"]
    summary = {
        "db": db,
        "n_trials": len(trials),
        "n_complete": len(complete),
        "n_pruned": len([t for t in trials if t["state"] == "pruned"]),
        "best_value": round(study.best_trial["value"], 2) if complete else None,
        "best_trial_id": study.best_trial["trial_id"] if complete else None,
        "best_params": study.best_trial["params"] if complete else None,
        "best_so_far": best_so_far(trials),
        "wall_s": round(time.time() - t0, 1),
    }
    logger.info("study %s: best %.2f at trial %s", name,
                summary["best_value"], summary["best_trial_id"])
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/sweep_tpu.yaml")
    ap.add_argument("--n_trials", type=int, default=20)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--steps_per_epoch", type=int, default=40)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--n_startup", type=int, default=8)
    ap.add_argument("--out_dir", default="/tmp/sbgm_gp_fair")
    args = ap.parse_args()

    import yaml

    from sbgm_danra_tpu.config import resolve_env
    from sbgm_danra_tpu.sweep.study import GPSampler, HaltonSampler
    from sbgm_danra_tpu.utils.jax_env import setup_jax_env, stabilize_tpu_cache_key

    setup_jax_env()
    stabilize_tpu_cache_key()
    os.makedirs(args.out_dir, exist_ok=True)
    with open(args.config) as f:
        base = resolve_env(yaml.safe_load(f))

    gp = run_study(
        "gp", GPSampler(seed=args.seed, n_startup=args.n_startup), base,
        args.out_dir, args.n_trials, args.epochs, args.steps_per_epoch,
    )
    halton = run_study(
        "halton", HaltonSampler(seed=args.seed), base,
        args.out_dir, args.n_trials, args.epochs, args.steps_per_epoch,
    )

    gp_post = (
        [v for v in gp["best_so_far"][args.n_startup:]] if gp["best_so_far"] else []
    )
    result = {
        "metric": "gp_vs_halton_best_val_loss",
        "n_trials_per_study": args.n_trials,
        "n_startup": args.n_startup,
        "gp": gp,
        "halton": halton,
        "gp_beats_halton_final": (
            gp["best_value"] is not None and halton["best_value"] is not None
            and gp["best_value"] < halton["best_value"]
        ),
        "gp_improved_after_startup": (
            bool(gp_post) and gp_post[-1] < gp["best_so_far"][args.n_startup - 1]
        ),
    }
    out = os.path.join(args.out_dir, "gp_fair_trial.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({k: result[k] for k in
                      ("gp_beats_halton_final", "gp_improved_after_startup")} |
                     {"gp_best": gp["best_value"], "halton_best": halton["best_value"]}))
    logger.info("wrote %s", out)


if __name__ == "__main__":
    main()
