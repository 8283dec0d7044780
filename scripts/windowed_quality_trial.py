"""Windowed (>HBM) training QUALITY vs resident at equal steps (VERDICT r4
missing-item 3).

The rotating-window loader trades the reference's global i.i.d. sampling
(/root/reference/sbgm/data_modules.py:747-763 — every batch draws from ALL
dates) for shuffle-buffer semantics over a resident window. This trial
measures what that does to learned quality, at EQUAL optimizer steps and
identical init/seeds, across three arms on the ~20 GiB synthetic archive:

- ``resident``     : DeviceDataLoader on the first window_days days — the
                     no-windowed-loader alternative (train on what fits HBM).
                     Sees 512/3680 of the data, i.i.d. within it.
- ``consecutive``  : WindowedDeviceLoader over ALL days, consecutive-day
                     windows (production default; seasonally correlated
                     windows by construction).
- ``strided``      : same, layout="strided" — each window spans the archive
                     (the i.i.d.-approximation mitigation).

Per arm: final EMA val loss on fixed-key batches (identical batches across
arms) and a K-member dpmpp-25 ensemble vs test truth (CRPS / ensemble-mean
RMSE / spread) in normalized space. All arms share the fused train scan
(training/fused.py) and the bf16 staging path where windowed.

Writes/updates the JSON after EVERY arm (crash-safe) and prints a markdown
fragment for BASELINE.md.

Usage:
  python scripts/windowed_quality_trial.py [--arms resident,consecutive,strided]
      [--steps 12000] [--batch 128] [--window_days 512] [--fused_steps 32]
      [--members 16] [--n_dates 16] [--root /tmp/sbgm_overhbm]
      [--out /tmp/windowed_quality.json]
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("windowed_quality")


def train_arm(arm: str, cfg, args, model, sde):
    """Equal-budget training through the fused scan; returns (state, stats)."""
    import jax
    import jax.numpy as jnp

    from sbgm_danra_tpu.data.device_data import DeviceDataLoader
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.windowed_data import WindowedDeviceLoader
    from sbgm_danra_tpu.training.fused import make_fused_train_step
    from sbgm_danra_tpu.training.state import create_train_state

    if arm == "resident":
        loader = DeviceDataLoader(
            make_dataset(cfg, "train", n_samples=args.window_days),
            batch_size=args.batch, seed=0,
            cfg_dropout_prob=cfg.classifier_free_guidance.drop_prob,
        )
    else:
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"),
            batch_size=args.batch, window_days=args.window_days,
            window_steps=0, seed=0,
            cfg_dropout_prob=cfg.classifier_free_guidance.drop_prob,
            dtype=jnp.bfloat16, layout=arm,
        )

    first = loader.sample(jax.random.PRNGKey(0))
    init = {k: v for k, v in first.items()
            if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")}
    state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
    fused = make_fused_train_step(
        model, sde, loader.sample_raw,
        use_sdf_weights=cfg.training.sdf_weighted_loss,
    )

    K = args.fused_steps
    rng = jax.random.PRNGKey(10)
    n = 0
    losses = []
    t0 = None
    logger.info("[%s] training %d steps (K=%d, first chunk compiles)...",
                arm, args.steps, K)
    while n < args.steps:
        for bufs, bkeys in loader.iter_chunks(K):
            sks = jax.random.split(rng, K + 1)
            rng = sks[0]
            state, traces = fused(state, bkeys, sks[1:], *bufs)
            loss = float(np.asarray(traces["loss"])[-1])  # drains the chunk
            if not np.isfinite(loss):
                raise RuntimeError(f"[{arm}] non-finite loss at step {n}")
            n += K
            if t0 is None:
                # clock starts after the first (compiling) chunk, which is
                # excluded from both the step count and the wall time
                t0 = time.perf_counter()
                n0 = n
            if (n // K) % 10 == 0:
                losses.append((n, loss))
                logger.info("[%s] step %d loss %.4f (%.0f samples/s)",
                            arm, n, loss,
                            (n - n0) * args.batch / (time.perf_counter() - t0))
            if n >= args.steps:
                break
    dt = time.perf_counter() - t0
    stats = {
        "steps": n,
        "train_samples_per_s": round((n - n0) * args.batch / dt, 1),
        "loss_trace": [(int(s), round(l, 4)) for s, l in losses],
        "n_swaps": getattr(loader, "n_swaps", None),
        "host_stall_s": round(getattr(loader, "stall_s", 0.0), 2),
    }
    return state, stats


def eval_val_loss(cfg, args, model, sde, state, n_batches: int = 20) -> float:
    """EMA val loss over fixed-key batches — identical batches across arms."""
    import jax

    from sbgm_danra_tpu.data.device_data import DeviceDataLoader
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.training.train_step import make_eval_step

    loader = DeviceDataLoader(
        make_dataset(cfg, "valid"), batch_size=args.batch, seed=7,
        cfg_dropout_prob=0.0,
    )
    step = jax.jit(make_eval_step(
        model, sde, use_sdf_weights=cfg.training.sdf_weighted_loss,
        use_ema=True,
    ))
    base = jax.random.PRNGKey(77)
    vals = []
    for i in range(n_batches):
        b = loader.sample(jax.random.fold_in(base, i))
        m = step(state, b, jax.random.fold_in(base, 1000 + i))
        vals.append(float(np.asarray(m["loss"])))
    return float(np.mean(vals))


def eval_ensemble(cfg, args, model, sde, state):
    """K-member dpmpp-25 unguided ensembles on fixed test dates; normalized-
    space CRPS / ensemble-mean RMSE / spread (flagship_quality_eval's metric
    definitions at trial scale)."""
    import copy

    import jax
    import jax.numpy as jnp

    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.loader import collate, extract_batch
    from sbgm_danra_tpu.evaluate.crps import crps_ensemble
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
    from sbgm_danra_tpu.training.train_step import make_score_fn

    load_cfg = copy.deepcopy(cfg)
    load_cfg.data_handling.device_dataset = False
    ds = make_dataset(load_cfg, "test")
    n = min(args.n_dates, len(ds))
    k = args.members
    samples = [
        ds.__getitem__(i, rng=np.random.default_rng((1234, i))) for i in range(n)
    ]
    batch = extract_batch(collate(samples), cfg.highres.variable)
    truth = np.asarray(batch["x"])[..., 0]
    cond = {
        key: jnp.asarray(np.repeat(np.asarray(batch[key]), k, axis=0))
        for key in ("y", "cond_img", "lsm_cond", "topo_cond")
        if key in batch
    }
    h, w = truth.shape[1:]
    score_fn = make_score_fn(model, state, use_ema=True)
    scfg = SamplerConfig(num_steps=25, eps=cfg.sampler.t_eps,
                         guidance_scale=0.0, edm_rho=cfg.sampler.edm_rho)
    sampler = get_sampler("dpmpp_sampler")
    fn = jax.jit(lambda key: sampler(
        score_fn, key, (n * k, h, w, 1), sde, scfg, cond=cond))
    members = np.asarray(jax.block_until_ready(fn(jax.random.PRNGKey(5))))
    members = members[..., 0].reshape(n, k, h, w)
    crps = float(np.mean(
        [crps_ensemble(members[i], truth[i]).mean() for i in range(n)]
    ))
    mean = members.mean(axis=1)
    rmse = float(np.sqrt(((mean - truth) ** 2).mean()))
    spread = float(np.sqrt(
        ((members - mean[:, None]) ** 2).sum(axis=1).mean() / (k - 1)
    ))
    return {
        "crps": round(crps, 4),
        "rmse_mean": round(rmse, 4),
        "spread": round(spread, 4),
        "spread_skill": round(spread * np.sqrt((k + 1) / k) / rmse, 4)
        if rmse > 0 else None,
        "members": k,
        "n_dates": n,
        "sampler": "dpmpp-25 w=0",
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arms", default="resident,consecutive,strided")
    ap.add_argument("--steps", type=int, default=12000)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--window_days", type=int, default=512)
    ap.add_argument("--fused_steps", type=int, default=32)
    ap.add_argument("--members", type=int, default=16)
    ap.add_argument("--n_dates", type=int, default=16)
    ap.add_argument("--days", type=int, default=4000)
    ap.add_argument("--root", default="/tmp/sbgm_overhbm")
    ap.add_argument("--out", default="/tmp/windowed_quality.json")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model for CPU smokes")
    args = ap.parse_args()

    from sbgm_danra_tpu.utils.jax_env import setup_jax_env, stabilize_tpu_cache_key

    setup_jax_env()
    stabilize_tpu_cache_key()

    from over_hbm_bench import bench_config, ensure_archive

    ensure_archive(args.root, args.days)

    from sbgm_danra_tpu.models.unet import build_score_model
    from sbgm_danra_tpu.sde import VESDE
    from sbgm_danra_tpu.training.pipeline import model_spec_from_config

    cfg = bench_config(args.root, args.batch, args.window_days, 0,
                       tiny=args.tiny)
    sde = VESDE()
    model = build_score_model(model_spec_from_config(cfg), sde)

    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)

    for arm in args.arms.split(","):
        arm = arm.strip()
        t0 = time.time()
        state, train_stats = train_arm(arm, cfg, args, model, sde)
        val = eval_val_loss(cfg, args, model, sde, state)
        ens = eval_ensemble(cfg, args, model, sde, state)
        results[arm] = {
            **train_stats,
            "final_val_loss_ema": round(val, 4),
            "ensemble": ens,
            "wall_min": round((time.time() - t0) / 60, 1),
        }
        logger.info("[%s] DONE: val %.4f crps %.4f (%s)",
                    arm, val, ens["crps"], json.dumps(train_stats)[:200])
        with open(args.out, "w") as f:
            json.dump(
                {
                    "metric": "windowed_training_quality_equal_steps",
                    "steps": args.steps, "batch": args.batch,
                    "window_days": args.window_days,
                    "fused_steps": args.fused_steps, **results,
                },
                f, indent=2,
            )
        del state

    print("\n| arm | val loss (EMA) | CRPS | RMSE(mean) | spread | samples/s |")
    print("|---|---|---|---|---|---|")
    for arm, r in results.items():
        if not isinstance(r, dict) or "ensemble" not in r:
            continue
        e = r["ensemble"]
        print(f"| {arm} | {r['final_val_loss_ema']} | {e['crps']} | "
              f"{e['rmse_mean']} | {e['spread']} | {r['train_samples_per_s']} |")


if __name__ == "__main__":
    main()
