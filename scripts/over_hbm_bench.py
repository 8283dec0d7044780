"""Larger-than-HBM training-input benchmark (VERDICT r3 missing-item 2).

Generates a synthetic DANRA-layout archive deliberately LARGER than a v5e
chip's 16 GiB HBM (default 4000 days at 589x789: train-split stacks
HR + 2 LR = ~21 GiB fp32), then measures sustained training samples/s through
the rotating-window device loader (data/windowed_data.py) against the fully
resident ceiling on a window-sized subset — same model, same batch, same
train step. Done-criterion: windowed within ~20% of resident.

The reference streams big archives through 56 DataLoader worker processes
(/root/reference/sbgm/training_utils.py:329-339); on this 1-core host that
path measures 25-30 samples/s (BASELINE input-pipeline table), ~300x short of
the chip. The windowed loader instead keeps the chip at device-resident speed
while the host refills the next window in the background.

r5 additions (VERDICT r4 weak-item 1): ``--fused_steps K`` runs both legs
through the fused sample+train scan (training/fused.py — K optimizer steps
per dispatch), which removes the ~28 ms/step dispatch tax AND frees the
1-core host + tunnel for the stager; steady-state windowed samples/s is
reported separately from the cumulative average (the first window's
cold-start transient understates the sustained rate); and when fused, the
eager resident ceiling is measured alongside the fused one — the gap IS the
dispatch tax (the r4 2751 vs r2-scan 4589 discrepancy).

Usage:
  python scripts/over_hbm_bench.py [--days 4000] [--window_days 512]
      [--batch 128] [--measure_windows 4] [--root /tmp/sbgm_overhbm]
      [--stage_dtype bfloat16] [--fused_steps 32]
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

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("over_hbm_bench")

CROP = (170, 350, 340, 520)
DOMAIN = (589, 789)


def ensure_archive(root: str, days: int) -> None:
    from sbgm_danra_tpu.data.paths import build_data_path
    from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate

    marker = build_data_path(root, "DANRA", "prcp", DOMAIN, "train")
    if os.path.isdir(marker):
        logger.info("archive already present at %s", root)
        return
    t0 = time.time()
    n_valid = min(160, days // 10)
    generate(SyntheticSpec(
        root=root,
        full_domain=DOMAIN,
        n_days=days,
        # explicit splits skip the storage-doubling 'all' split; train is the
        # >HBM part, valid/test stay small (valid must fit HBM - factory keeps
        # it fully resident)
        splits={
            "train": (0, days - 2 * n_valid),
            "valid": (days - 2 * n_valid, days - n_valid),
            "test": (days - n_valid, days),
        },
        crop_region=CROP,
        seed=1,
    ))
    logger.info("archive generated in %.1f min", (time.time() - t0) / 60)


def bench_config(root: str, batch: int, window_days: int, window_steps: int,
                 tiny: bool = False):
    from sbgm_danra_tpu.config import from_dict

    sampler = (
        {"sampler_type": "edm_sampler", "n_timesteps": 35, "time_embedding": 32,
         "last_fmap_channels": 64, "num_heads": 1, "block_layers": [1, 1, 1, 1]}
        if tiny else
        {"sampler_type": "edm_sampler", "n_timesteps": 35, "time_embedding": 256,
         "last_fmap_channels": 512, "num_heads": 4, "block_layers": [2, 2, 2, 2]}
    )
    return from_dict({
        "experiment": {"name": "over_hbm", "config_name": "over_hbm"},
        "paths": {
            "data_dir": root,
            "checkpoint_dir": os.path.join(root, "ckpt"),
            "sample_dir": os.path.join(root, "samples"),
            "path_save": os.path.join(root, "samples"),
            "lsm_path": os.path.join(root, "data_lsm/truth_fullDomain/lsm_full.npz"),
            "topo_path": os.path.join(root, "data_topo/truth_fullDomain/topo_full.npz"),
            "stats_load_dir": os.path.join(root, "stats"),
        },
        "highres": {
            "model": "DANRA", "variable": "prcp", "data_size": [128, 128],
            "scaling_method": "log_zscore", "full_domain_dims": list(DOMAIN),
            "cutout_domains": list(CROP), "buffer_frac": 0.2,
        },
        "lowres": {
            "model": "ERA5", "condition_variables": ["temp", "prcp"],
            "scaling_methods": ["zscore", "log_zscore"],
            "full_domain_dims": list(DOMAIN), "buffer_frac": 0.2,
        },
        "sampler": sampler,
        "model": {"compute_dtype": "bfloat16"},
        "data_handling": {
            "device_dataset": True,
            "device_window_days": window_days,
            "device_window_steps": window_steps,
        },
        "training": {"seed": 0, "batch_size": batch, "learning_rate": 1e-4},
        "classifier_free_guidance": {"enabled": True, "drop_prob": 0.1},
    })


def measure_loop(loader, state, step_fn, min_steps: int, min_seconds: float,
                 batch: int):
    """Sustained samples/s over >= min_steps and >= min_seconds of steps
    (warmup excluded: first 3 steps compile/settle)."""
    import jax

    it = iter(loader)
    for _ in range(3):
        state, m = step_fn(state, next(it), jax.random.PRNGKey(0))
    _drain(m)
    n = 0
    t0 = time.perf_counter()
    rng = jax.random.PRNGKey(1)
    while n < min_steps or time.perf_counter() - t0 < min_seconds:
        try:
            b = next(it)
        except StopIteration:
            it = iter(loader)
            b = next(it)
        rng, k = jax.random.split(rng)
        state, m = step_fn(state, b, k)
        n += 1
    _drain(m)
    dt = time.perf_counter() - t0
    return state, n * batch / dt, n, dt


def measure_fused_resident(loader, state, fused, batch: int, k: int,
                           min_steps: int, min_seconds: float):
    """Fused-scan resident throughput: chunks of K steps, drained per chunk."""
    import jax
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(1)

    def run_chunk(state, rng, bufs, bkeys):
        sks = jax.random.split(rng, k + 1)
        state, traces = fused(state, bkeys, sks[1:], *bufs)
        return state, sks[0], float(np.asarray(traces["loss"])[-1])

    chunks = loader.iter_chunks(k, n_chunks=10**9)
    bufs, bkeys = next(chunks)
    state, rng, loss = run_chunk(state, rng, bufs, bkeys)  # compile + settle
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite loss {loss}")
    n = 0
    t0 = time.perf_counter()
    while n < min_steps or time.perf_counter() - t0 < min_seconds:
        bufs, bkeys = next(chunks)
        state, rng, loss = run_chunk(state, rng, bufs, bkeys)
        n += k
    dt = time.perf_counter() - t0
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite loss {loss}")
    return state, n * batch / dt, n, dt


def _drain(m) -> float:
    """Sync by VALUE: on the remote platform block_until_ready does not block
    on execution (measured 2 ms 'sync' vs 150+ s true drain — bench.py); the
    only honest barrier is fetching a scalar. Dispatches complete in order, so
    fetching the latest loss drains the whole queue. Also asserts finiteness —
    a NaN loop measures garbage."""
    loss = float(np.asarray(m["loss"]))
    if not np.isfinite(loss):
        raise RuntimeError(f"non-finite training loss: {loss}")
    return loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/sbgm_overhbm")
    ap.add_argument("--days", type=int, default=4000)
    ap.add_argument("--window_days", type=int, default=512)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--measure_windows", type=int, default=4,
                    help="measure the windowed leg across >= this many swaps")
    ap.add_argument("--out", default="/tmp/over_hbm_bench.json")
    ap.add_argument("--min_steps", type=int, default=200,
                    help="resident-leg minimum timed steps")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny model for CPU smokes (throughput numbers are "
                         "only meaningful with the flagship model on a chip)")
    ap.add_argument("--stage_dtype", default="float32",
                    choices=["float32", "bfloat16"],
                    help="window staging dtype (bfloat16 halves host upload "
                         "bytes; see data_handling.device_window_dtype)")
    ap.add_argument("--fused_steps", type=int, default=0,
                    help="K>0: run both legs through the fused sample+train "
                         "scan (K steps per dispatch, training/fused.py)")
    args = ap.parse_args()

    from sbgm_danra_tpu.utils.jax_env import setup_jax_env, stabilize_tpu_cache_key

    setup_jax_env()
    stabilize_tpu_cache_key()

    ensure_archive(args.root, args.days)

    import jax

    from sbgm_danra_tpu.data.device_data import DeviceDataLoader
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.windowed_data import WindowedDeviceLoader
    from sbgm_danra_tpu.models.unet import build_score_model
    from sbgm_danra_tpu.training.pipeline import model_spec_from_config
    from sbgm_danra_tpu.sde import VESDE
    from sbgm_danra_tpu.training.state import create_train_state
    from sbgm_danra_tpu.training.train_step import make_train_step

    cfg = bench_config(args.root, args.batch, args.window_days, 0, tiny=args.tiny)
    sde = VESDE()
    model = build_score_model(model_spec_from_config(cfg), sde)
    step_fn = jax.jit(
        make_train_step(model, sde, use_sdf_weights=cfg.training.sdf_weighted_loss),
        donate_argnums=0,
    )

    # --- leg 1: resident ceiling on a window-sized subset --------------------
    logger.info("leg 1: resident ceiling (window-sized subset of %d days)",
                args.window_days)
    ds_small = make_dataset(cfg, "train", n_samples=args.window_days)
    resident = DeviceDataLoader(
        ds_small, batch_size=args.batch, seed=0,
        cfg_dropout_prob=cfg.classifier_free_guidance.drop_prob,
    )
    first = resident.sample(jax.random.PRNGKey(0))
    init = {k: v for k, v in first.items()
            if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")}
    state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
    state, ceiling, n_c, dt_c = measure_loop(
        resident, state, step_fn, min_steps=args.min_steps, min_seconds=20.0, batch=args.batch
    )
    logger.info("resident ceiling (eager): %.0f samples/s (%d steps / %.1fs)",
                ceiling, n_c, dt_c)

    fused = None
    fused_ceiling = None
    if args.fused_steps > 0:
        from sbgm_danra_tpu.training.fused import make_fused_train_step

        fused = make_fused_train_step(
            model, sde, resident.sample_raw,
            use_sdf_weights=cfg.training.sdf_weighted_loss,
        )
        logger.info("leg 1b: fused resident ceiling (K=%d steps/dispatch)",
                    args.fused_steps)
        state, fused_ceiling, n_f, dt_f = measure_fused_resident(
            resident, state, fused, args.batch, args.fused_steps,
            min_steps=args.min_steps, min_seconds=20.0,
        )
        logger.info(
            "resident ceiling (fused K=%d): %.0f samples/s (%d steps / %.1fs; "
            "eager gap = dispatch tax %.1f ms/step)",
            args.fused_steps, fused_ceiling, n_f, dt_f,
            1e3 * (1.0 / ceiling - 1.0 / fused_ceiling) * args.batch,
        )
    del resident, ds_small, first

    # --- leg 2: windowed loader over the full >HBM archive -------------------
    logger.info("leg 2: windowed loader over the full archive")
    ds_full = make_dataset(cfg, "train")
    import jax.numpy as jnp

    windowed = WindowedDeviceLoader(
        ds_full, batch_size=args.batch, window_days=args.window_days,
        window_steps=0, seed=0,
        cfg_dropout_prob=cfg.classifier_free_guidance.drop_prob,
        dtype=jnp.dtype(args.stage_dtype),
    )
    n_days = len(windowed.dates)
    day_bytes = (
        np.prod((*DOMAIN,)) * 4 * (1 + len(cfg.lowres.condition_variables))
    )
    archive_gib = n_days * day_bytes / 2**30
    window_gib = args.window_days * day_bytes / 2**30
    logger.info("train archive %.1f GiB (> 16 GiB HBM: %s), window %.1f GiB x2",
                archive_gib, archive_gib > 16, window_gib)

    swaps_target = args.measure_windows
    # (steps, wall, swaps) at every drain point — steady-state = the rate
    # AFTER the first swap (the first window's cold start, where the stager
    # competes with compile + the initial uploads, understates the sustained
    # rate; r4 reported only the still-climbing cumulative average)
    records = []
    t0 = time.perf_counter()
    n = 0
    rng = jax.random.PRNGKey(2)
    if args.fused_steps > 0:
        K = args.fused_steps
        fused_w = make_fused_train_step(
            model, sde, windowed.sample_raw,
            use_sdf_weights=cfg.training.sdf_weighted_loss,
        )
        compiled = False
        while windowed.n_swaps < swaps_target:
            for bufs, bkeys in windowed.iter_chunks(K):
                sks = jax.random.split(rng, K + 1)
                rng = sks[0]
                state, traces = fused_w(state, bkeys, sks[1:], *bufs)
                loss = float(np.asarray(traces["loss"])[-1])  # drains chunk
                if not np.isfinite(loss):
                    raise RuntimeError(f"non-finite loss {loss}")
                if not compiled:
                    # exclude the one-off scan compile from the clock
                    compiled = True
                    t0 = time.perf_counter()
                    n = 0
                    continue
                n += K
                records.append((n, time.perf_counter() - t0, windowed.n_swaps))
                if (n // K) % 10 == 0:
                    logger.info(
                        "windowed/fused: %d steps, %d swaps, stall %.2fs, "
                        "%.0f samples/s",
                        n, windowed.n_swaps, windowed.stall_s,
                        n * args.batch / (time.perf_counter() - t0))
                if windowed.n_swaps >= swaps_target:
                    break
    else:
        it = iter(windowed)
        m = None
        while windowed.n_swaps < swaps_target:
            try:
                b = next(it)
            except StopIteration:
                it = iter(windowed)
                b = next(it)
            rng, k = jax.random.split(rng)
            state, m = step_fn(state, b, k)
            n += 1
            if n % 500 == 0:
                _drain(m)
                records.append((n, time.perf_counter() - t0, windowed.n_swaps))
                logger.info("windowed: %d steps, %d swaps, stall %.2fs, %.0f samples/s",
                            n, windowed.n_swaps, windowed.stall_s,
                            n * args.batch / (time.perf_counter() - t0))
        _drain(m)
        records.append((n, time.perf_counter() - t0, windowed.n_swaps))
    dt = time.perf_counter() - t0
    windowed_rate = n * args.batch / dt

    # steady-state: rate over the span after the first swap is visible
    steady_rate = None
    post = [(s, t) for s, t, sw in records if sw >= 1]
    if len(post) >= 2 and post[-1][1] > post[0][1]:
        steady_rate = (post[-1][0] - post[0][0]) * args.batch / (
            post[-1][1] - post[0][1])
        logger.info("steady-state (post first swap): %.0f samples/s", steady_rate)

    result = {
        "metric": "over_hbm_windowed_train_samples_per_sec",
        "archive_days": n_days,
        "archive_train_gib": round(archive_gib, 2),
        "exceeds_hbm_16gib": bool(archive_gib > 16),
        "window_days": args.window_days,
        "window_gib": round(window_gib, 2),
        "batch": args.batch,
        "resident_ceiling_samples_per_s": round(ceiling, 1),
        "resident_ceiling_fused_samples_per_s": (
            round(fused_ceiling, 1) if fused_ceiling else None),
        "windowed_samples_per_s": round(windowed_rate, 1),
        "windowed_steady_samples_per_s": (
            round(steady_rate, 1) if steady_rate else None),
        "ratio_vs_ceiling": round(
            (steady_rate or windowed_rate) / (fused_ceiling or ceiling), 3),
        "ratio_definition": "steady-state windowed / matching-mode ceiling",
        "fused_steps": args.fused_steps,
        "stage_dtype": args.stage_dtype,
        "n_steps": n,
        "n_swaps": windowed.n_swaps,
        "host_stall_s": round(windowed.stall_s, 2),
        "wall_s": round(dt, 1),
        "platform": jax.default_backend(),
    }
    print(json.dumps(result))
    with open(args.out, "w") as f:
        json.dump(result, f, indent=2)
    logger.info("wrote %s", args.out)


if __name__ == "__main__":
    main()
