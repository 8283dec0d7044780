"""Full-domain ensemble QUALITY with a learned score (VERDICT r3 item 4).

Round 2/3 measured full-domain sampling SPEED (0.59-0.70 s walls) and warned
that crop-trained normalization stats may be wrong out of crop
(data/factory.py crop-stats caveat) — but never measured quality. This script
closes BASELINE config 4's quality leg:

1. loads the flagship trained by configs/full_scale_quality.yaml (a 589x789
   synthetic archive, 128x128 crop training — the reference recipe);
2. draws test-split dates FULL-DOMAIN (truth + conditioning at 589x789,
   normalized with the TRAINING-CROP stats, exactly as serving would);
3. generates K-member full-domain ensembles (padded 608x800 reverse scan,
   EDM, s_churn 0) at CFG w in {0, 3};
4. scores CRPS / ensemble-mean RMSE / spread-skill / radial spectra in
   normalized space — OVERALL and split IN-CROP (rows 170:350, cols 340:520)
   vs OUT-OF-CROP, quantifying the crop-stats caveat ("out-of-crop CRPS is
   X% worse" replaces the unquantified warning).

Reference anchor: sbgm/score_unet.py:780 (attention "very expensive" — the
reference cannot run this experiment at all).

Usage:
  python scripts/full_domain_quality_eval.py [--config configs/full_scale_quality.yaml]
      [--n_dates 8] [--members 16] [--member_chunk 4] [--out ...]
"""

from __future__ import annotations

import argparse
import copy
import json
import logging
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

logging.basicConfig(level=logging.INFO, format="%(asctime)s %(name)s: %(message)s")
logger = logging.getLogger("full_domain_quality")


def region_masks(h: int, w: int, crop):
    x1, x2, y1, y2 = crop
    m = np.zeros((h, w), bool)
    m[x1:x2, y1:y2] = True
    return m, ~m


def ens_metrics(members: np.ndarray, truth: np.ndarray, mask=None):
    """members [N, K, H, W], truth [N, H, W] -> pooled metrics (optionally
    restricted to a boolean HxW mask)."""
    from sbgm_danra_tpu.evaluate.calibration import ensemble_spread_skill
    from sbgm_danra_tpu.evaluate.crps import crps_ensemble

    crps_px = np.stack([crps_ensemble(members[i], truth[i]) for i in range(len(truth))])
    mean = members.mean(axis=1)
    err2 = (mean - truth) ** 2
    if mask is not None:
        crps_v = crps_px[:, mask]
        rmse = float(np.sqrt(err2[:, mask].mean()))
        # masked selections are flat pixel vectors; ensemble_spread_skill
        # expects 2-D fields, so give the pooled pixels a singleton width
        spread, _ = ensemble_spread_skill(
            members[:, :, mask][..., None], truth[:, mask][..., None]
        )
    else:
        crps_v = crps_px
        rmse = float(np.sqrt(err2.mean()))
        spread, _ = ensemble_spread_skill(members, truth)
    return {
        "crps": round(float(crps_v.mean()), 4),
        "rmse_mean": round(rmse, 4),
        "spread": round(spread, 4),
        "spread_skill": round(spread / rmse, 3) if rmse > 0 else None,
    }


def spectrum_logmse(members: np.ndarray, truth: np.ndarray) -> float:
    """log-space MSE of the mean radial power spectrum, generated vs truth."""
    from sbgm_danra_tpu.pipelines.comparison import (
        compute_2d_power_spectrum,
        radial_average,
    )

    def mean_spec(fields):
        specs = [radial_average(compute_2d_power_spectrum(f)) for f in fields]
        n = min(len(s) for s in specs)
        return np.mean([s[:n] for s in specs], axis=0)

    gen = mean_spec([m for e in members for m in e[:2]])  # 2 members/date
    tru = mean_spec(list(truth))
    n = min(len(gen), len(tru))
    eps = 1e-12
    return float(np.mean((np.log(gen[:n] + eps) - np.log(tru[:n] + eps)) ** 2))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/full_scale_quality.yaml")
    ap.add_argument("--n_dates", type=int, default=8)
    ap.add_argument("--members", type=int, default=16)
    ap.add_argument("--member_chunk", type=int, default=4,
                    help="members per device dispatch (608x800 activations)")
    ap.add_argument("--guidance", default="0,3")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from sbgm_danra_tpu.utils.jax_env import setup_jax_env, stabilize_tpu_cache_key

    setup_jax_env()
    stabilize_tpu_cache_key()

    import jax
    import jax.numpy as jnp

    from sbgm_danra_tpu.cli.entries import _load_pipeline_for_sampling
    from sbgm_danra_tpu.compile_options import compile_lowered
    from sbgm_danra_tpu.config import load_config
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.loader import collate, extract_batch
    from sbgm_danra_tpu.evaluate.full_domain import pad_conditioning, padded_dims
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler

    cfg = load_config(args.config)
    load_cfg = copy.deepcopy(cfg)
    load_cfg.data_handling.device_dataset = False
    load_cfg.training.batch_size = 4
    pipeline, _ = _load_pipeline_for_sampling(load_cfg)
    score_fn = pipeline.score_fn(use_ema=cfg.training.load_ema)
    sde = pipeline.sde

    # ---- full-domain test conditions + truth --------------------------------
    ds = make_dataset(load_cfg, "test", full_domain=True)
    n_dates = min(args.n_dates, len(ds))
    samples = [ds.__getitem__(i, rng=np.random.default_rng((99, i)))
               for i in range(n_dates)]
    batch = extract_batch(collate(samples), cfg.highres.variable)
    truth = np.asarray(batch["x"])[..., 0]  # [N, 589, 789] normalized
    dom_h, dom_w = truth.shape[1:]
    target = padded_dims(dom_h, dom_w)
    logger.info("%d test dates full-domain %dx%d (padded %dx%d), %d members",
                n_dates, dom_h, dom_w, *target, args.members)

    base_cond = {
        key: np.asarray(batch[key])
        for key in ("y", "cond_img", "lsm_cond", "topo_cond")
        if key in batch
    }

    mc = args.member_chunk
    shape = (mc, target[0], target[1], 1)
    results = {"n_dates": n_dates, "members": args.members,
               "domain": [dom_h, dom_w], "padded": list(target),
               "sampler": f"edm_{cfg.sampler.n_timesteps}_churn0"}
    crop = tuple(cfg.highres.cutout_domains)
    in_mask, out_mask = region_masks(dom_h, dom_w, crop)

    for w_str in args.guidance.split(","):
        w = float(w_str)
        scfg = SamplerConfig(
            num_steps=cfg.sampler.n_timesteps, snr=cfg.sampler.snr,
            eps=cfg.sampler.t_eps, guidance_scale=w if w > 0 else None,
            edm_rho=cfg.sampler.edm_rho, s_churn=0.0,
        )
        sampler = get_sampler("edm_sampler")
        fn = jax.jit(lambda key, c: sampler(score_fn, key, shape, sde, scfg, cond=c))
        compiled = None
        members = np.empty((n_dates, args.members, dom_h, dom_w), np.float32)
        t0 = time.time()
        for d in range(n_dates):
            cond_d = pad_conditioning(
                {k: jnp.asarray(np.repeat(v[d : d + 1], mc, axis=0))
                 for k, v in base_cond.items()},
                target,
            )
            if compiled is None:
                logger.info("compiling full-domain EDM (w=%s)...", w)
                compiled = compile_lowered(fn.lower(jax.random.PRNGKey(0), cond_d))
            for c0 in range(0, args.members, mc):
                key = jax.random.fold_in(jax.random.PRNGKey(17), d * 1000 + c0)
                out = np.asarray(jax.block_until_ready(compiled(key, cond_d)))
                members[d, c0 : c0 + mc] = out[: args.members - c0, :dom_h, :dom_w, 0]
        wall = time.time() - t0
        assert np.isfinite(members).all(), "non-finite full-domain members"

        block = {
            "overall": ens_metrics(members, truth),
            "in_crop": ens_metrics(members, truth, in_mask),
            "out_of_crop": ens_metrics(members, truth, out_mask),
            "spectrum_logmse": round(spectrum_logmse(members, truth), 4),
            "gen_wall_s": round(wall, 1),
            "s_per_member_field": round(wall / (n_dates * args.members), 3),
        }
        ic, oc = block["in_crop"]["crps"], block["out_of_crop"]["crps"]
        block["out_of_crop_crps_penalty_pct"] = round(100.0 * (oc - ic) / ic, 1)
        results[f"w{w_str}"] = block
        logger.info("w=%s: overall CRPS %.3f | in-crop %.3f | out-of-crop %.3f "
                    "(+%.1f%%) | spread/skill %.2f",
                    w_str, block["overall"]["crps"], ic, oc,
                    block["out_of_crop_crps_penalty_pct"],
                    block["overall"]["spread_skill"])

    out = args.out or os.path.join(cfg.paths.sample_dir, "full_domain_quality.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))
    logger.info("wrote %s", out)


if __name__ == "__main__":
    main()
