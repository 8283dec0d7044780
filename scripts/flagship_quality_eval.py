"""Learned-model ensemble quality study (VERDICT r2 item 1).

Evaluates the flagship checkpoint trained by configs/flagship_synth.yaml — the
loop the reference never completed (its training.py:424-508 epoch loop died in
epoch 1; evaluate_sbgm/evaluation.py:266-443 is the metric surface re-created
here, extended with ensemble CRPS/spread-skill/rank histograms):

1. deterministic test-split conditions (fixed crop per date);
2. K-member ensembles with EDM-35+churn (the fast path) AND PC-1000 (the
   reference-parity sampler) at CFG w=3, from the SAME learned score;
3. per-date CRPS, ensemble-mean RMSE, spread/skill, pooled rank histogram —
   in normalized model space and back-transformed physical units;
4. CFG effect: w in {0, 3, 7} with EDM;
5. generated-vs-truth radial power spectra (log-space MSE).

Writes JSON (+ a markdown table fragment for BASELINE.md) to the sample dir.

Usage:  python scripts/flagship_quality_eval.py [--config configs/flagship_synth.yaml]
        [--n_dates 16] [--members 32] [--skip_pc]
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/flagship_synth.yaml")
    p.add_argument("--n_dates", type=int, default=16)
    p.add_argument("--members", type=int, default=32)
    p.add_argument("--skip_pc", action="store_true")
    p.add_argument("--churn_sweep", action="store_true",
                   help="EDM s_churn in {0,7,21,28} at w=3 (14 is the default run)")
    p.add_argument("--nfe_sweep", action="store_true",
                   help="EDM node count in {18,50,80} at w=3 (35 is the default run)")
    p.add_argument("--dpmpp", action="store_true",
                   help="add DPM-Solver++(2M) rows (25 nodes, w in {0,3}) — "
                        "the 24-NFE deterministic path, learned-score check")
    p.add_argument("--calibrate", action="store_true",
                   help="fit spread calibration on VALID-split ensembles and "
                        "report calibrated test metrics (evaluate/calibration.py)")
    p.add_argument("--pc_chunk_dates", type=int, default=2,
                   help="dates per PC-1000 dispatch (RPC-timeout guard)")
    p.add_argument("--out", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from sbgm_danra_tpu.cli.entries import _back_transforms, _load_pipeline_for_sampling
    from sbgm_danra_tpu.config import load_config
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.loader import extract_batch
    from sbgm_danra_tpu.evaluate.crps import crps_ensemble
    from sbgm_danra_tpu.pipelines.comparison import (
        compute_2d_power_spectrum,
        radial_average,
    )
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
    from sbgm_danra_tpu.compile_options import compile_lowered

    cfg = load_config(args.config)
    # eval-only process: host loaders are fine for checkpoint loading and the
    # handful of test conditions; don't upload the train split to HBM.
    load_cfg = copy.deepcopy(cfg)
    load_cfg.data_handling.device_dataset = False
    load_cfg.training.batch_size = 4
    pipeline, _ = _load_pipeline_for_sampling(load_cfg)
    back = _back_transforms(cfg)
    score_fn = pipeline.score_fn(use_ema=cfg.training.load_ema)
    sde = pipeline.sde

    # ---- deterministic conditions (fixed crop per date) ---------------------
    from sbgm_danra_tpu.data.loader import collate

    k = args.members

    def tile_members(arr):
        # [N, ...] -> [N*K, ...] (member-major per date: date i occupies i*K:(i+1)*K)
        return np.repeat(np.asarray(arr), k, axis=0)

    def build_conditions(split, n, seed_base):
        ds = make_dataset(load_cfg, split)
        n = min(n, len(ds))
        samples = [
            ds.__getitem__(i, rng=np.random.default_rng((seed_base, i)))
            for i in range(n)
        ]
        batch = extract_batch(collate(samples), cfg.highres.variable)
        truth = np.asarray(batch["x"])[..., 0]  # [N, H, W] normalized space
        conds = {
            key: jnp.asarray(tile_members(batch[key]))
            for key in ("y", "cond_img", "lsm_cond", "topo_cond")
            if key in batch
        }
        return conds, truth

    cond, truth_test = build_conditions("test", args.n_dates, 1234)
    n_dates = truth_test.shape[0]
    h, w = truth_test.shape[1:]
    total = n_dates * k
    shape = (total, h, w, 1)
    g = cfg.classifier_free_guidance

    def run_sampler(name, num_steps, guidance, s_churn=0.0, seed=0,
                    chunk_dates=None, cond_set=None):
        """chunk_dates: dates per device dispatch. Long single dispatches
        (PC-1000 at 512 members is ~5 min of device time) trip the remote
        platform's RPC timeout; chunking keeps each dispatch well under it at
        identical total compute."""
        conds = cond if cond_set is None else cond_set
        nd = next(iter(conds.values())).shape[0] // k
        sampler = get_sampler(name)
        scfg = SamplerConfig(
            num_steps=num_steps,
            snr=cfg.sampler.snr,
            eps=cfg.sampler.t_eps,
            guidance_scale=guidance,
            guidance_scale_max=g.guidance_scale_max,
            edm_rho=cfg.sampler.edm_rho,
            s_churn=s_churn,
        )
        nd_chunk = chunk_dates or nd
        cshape = (nd_chunk * k, h, w, 1)
        fn = jax.jit(lambda key, c: sampler(score_fn, key, cshape, sde, scfg, cond=c))

        def cond_slice(d0, d1):
            sl = {key: v[d0 * k : d1 * k] for key, v in conds.items()}
            # a short tail chunk (nd not divisible by chunk_dates) is padded
            # by repeating the last date so every dispatch matches the AOT
            # executable's fixed shape; padded rows are trimmed after the loop
            short = nd_chunk * k - next(iter(sl.values())).shape[0]
            if short > 0:
                sl = {
                    key: np.concatenate(
                        [np.asarray(v), np.repeat(np.asarray(v[-1:]), short, axis=0)]
                    )
                    for key, v in sl.items()
                }
            return sl

        t0 = time.time()
        lowered = fn.lower(jax.random.PRNGKey(seed), cond_slice(0, nd_chunk))
        compiled = compile_lowered(lowered)
        t_compile = time.time() - t0
        t0 = time.time()
        outs = []
        for d0 in range(0, nd, nd_chunk):
            key = jax.random.fold_in(jax.random.PRNGKey(seed), d0)
            outs.append(
                np.asarray(
                    jax.block_until_ready(compiled(key, cond_slice(d0, d0 + nd_chunk)))
                )
            )
        t_run = time.time() - t0
        members = np.concatenate(outs)[..., 0][: nd * k].reshape(nd, k, h, w)
        return members, t_compile, t_run

    def metrics(members, vs_truth=None):
        """members [N, K, H, W] vs truth [N, H, W]; normalized + physical."""
        truth = truth_test if vs_truth is None else vs_truth
        n_dates = truth.shape[0]
        out = {}
        for space, mem, tru in (
            ("normalized", members, truth),
            (
                "physical",
                np.asarray(back["generated"](members)) if "generated" in back else None,
                np.asarray(back["generated"](truth)) if "generated" in back else None,
            ),
        ):
            if mem is None:
                continue
            crps = np.mean(
                [crps_ensemble(mem[i], tru[i]).mean() for i in range(n_dates)]
            )
            mean = mem.mean(axis=1)
            rmse = float(np.sqrt(((mean - tru) ** 2).mean()))
            # fair spread/skill: sqrt((K+1)/K) * ensemble std vs mean RMSE
            spread = float(
                np.sqrt(((mem - mean[:, None]) ** 2).sum(axis=1).mean() / (k - 1))
            )
            ss = spread * np.sqrt((k + 1) / k) / rmse if rmse > 0 else np.nan
            out[space] = {
                "crps": float(crps),
                "rmse_mean": rmse,
                "spread": spread,
                "spread_skill": float(ss),
            }
        # pooled rank histogram (normalized space, subsampled pixels)
        rng = np.random.default_rng(0)
        ii = rng.integers(0, h, 400)
        jj = rng.integers(0, w, 400)
        ranks = (members[:, :, ii, jj] < truth[:, None, ii, jj]).sum(axis=1).ravel()
        hist, _ = np.histogram(ranks, bins=np.arange(k + 2) - 0.5)
        out["rank_histogram"] = (hist / hist.sum()).round(5).tolist()
        # spectra: radial power of generated mean-member vs truth
        def spec(fields):
            ps = np.mean([compute_2d_power_spectrum(f) for f in fields], axis=0)
            return radial_average(ps)
        s_truth = spec(truth)
        s_gen = spec(members.reshape(-1, h, w)[:: max(1, k // 4)])
        eps = 1e-12
        out["spectrum_log_mse"] = float(
            np.mean((np.log(s_gen + eps) - np.log(s_truth + eps)) ** 2)
        )
        return out

    results = {"n_dates": n_dates, "members": k, "image_hw": [h, w]}
    out_path = args.out or os.path.join(
        cfg.paths.sample_dir, "flagship_quality_eval.json"
    )
    os.makedirs(os.path.dirname(out_path), exist_ok=True)

    def checkpoint_results():
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)

    edm, tc, tr = run_sampler(
        "edm_sampler", cfg.sampler.n_timesteps, g.guidance_scale, cfg.sampler.s_churn
    )
    results["edm_w3"] = metrics(edm)
    results["edm_w3"]["compile_s"] = round(tc, 2)
    results["edm_w3"]["run_s"] = round(tr, 3)
    checkpoint_results()
    print("EDM-35+churn w=3:", json.dumps(results["edm_w3"], indent=2)[:400])

    for wgt in (0.0, 7.0):
        m_, tc, tr = run_sampler(
            "edm_sampler", cfg.sampler.n_timesteps,
            None if wgt == 0.0 else wgt, cfg.sampler.s_churn, seed=1,
        )
        key = f"edm_w{int(wgt)}"
        results[key] = metrics(m_)
        results[key]["run_s"] = round(tr, 3)
        checkpoint_results()
        print(key, "crps:", results[key]["normalized"]["crps"])

    if args.churn_sweep:
        # calibration lever: stochastic churn re-injects noise along the EDM
        # trajectory (exact-score study: repairs init-coverage gaps). Measures
        # whether it also tightens a LEARNED score's spread/skill.
        for sc in (0.0, 7.0, 21.0, 28.0):
            m_, tc, tr = run_sampler(
                "edm_sampler", cfg.sampler.n_timesteps, g.guidance_scale, sc, seed=2
            )
            key = f"edm_w3_churn{int(sc)}"
            results[key] = metrics(m_)
            results[key]["run_s"] = round(tr, 3)
            checkpoint_results()
            print(key, "crps:", results[key]["normalized"]["crps"],
                  "spread/skill:", results[key]["normalized"]["spread_skill"])

    if args.nfe_sweep:
        # quality-vs-NFE curve with the learned score (exact-score study
        # pinned 18-50 nodes at parity; verify that survives learning).
        for n in (18, 50, 80):
            m_, tc, tr = run_sampler(
                "edm_sampler", n, g.guidance_scale, cfg.sampler.s_churn, seed=3
            )
            key = f"edm{n}_w3"
            results[key] = metrics(m_)
            results[key]["run_s"] = round(tr, 3)
            checkpoint_results()
            print(key, "crps:", results[key]["normalized"]["crps"])

    dpmpp_test = None
    if args.dpmpp:
        # learned-score check for the 24-NFE multistep path (exact-score
        # parity is pinned in BASELINE.md; this measures it with a real
        # model): 25 and 35 nodes, w in {0, 3} (VERDICT r3 item 3)
        for nodes, wgt in ((25, 3.0), (25, 0.0), (35, 3.0)):
            m_, tc, tr = run_sampler(
                "dpmpp_sampler", nodes, None if wgt == 0.0 else wgt, 0.0, seed=5
            )
            key = f"dpmpp{nodes}_w{int(wgt)}"
            if key == "dpmpp25_w3":
                dpmpp_test = m_
            results[key] = metrics(m_)
            results[key]["compile_s"] = round(tc, 2)
            results[key]["run_s"] = round(tr, 3)
            checkpoint_results()
            print(key, "crps:", results[key]["normalized"]["crps"])

    if args.calibrate:
        # fit ensemble inflation on VALID-split ensembles (same sampler/seed
        # protocol, disjoint dates), apply to the test EDM w=3 members —
        # out-of-sample calibrated quality (evaluate/calibration.py).
        from sbgm_danra_tpu.evaluate.calibration import (
            apply_spread_scale,
            fit_spread_scale,
        )

        vcond, truth_val = build_conditions("valid", args.n_dates, 5678)
        vm, tc, tr = run_sampler(
            "edm_sampler", cfg.sampler.n_timesteps, g.guidance_scale,
            cfg.sampler.s_churn, seed=4, cond_set=vcond,
        )
        alphas = {
            rule: fit_spread_scale(vm, truth_val, rule=rule)
            for rule in ("crps", "spread_skill")
        }
        results["calibration"] = {
            "fit_split": "valid", "fit_dates": int(truth_val.shape[0]),
            "val_run_s": round(tr, 3),
            **{f"alpha_{k_}": round(v, 4) for k_, v in alphas.items()},
        }
        for rule, alpha in alphas.items():
            key = f"edm_w3_cal_{rule}"
            results[key] = metrics(apply_spread_scale(edm, alpha))
            results[key]["alpha"] = round(alpha, 4)
            checkpoint_results()
            nrm = results[key]["normalized"]
            print(key, f"alpha={alpha:.3f}", "crps:", nrm["crps"],
                  "spread/skill:", nrm["spread_skill"])

        if dpmpp_test is not None:
            # dpmpp's own calibration leg (VERDICT r3 item 3 "+- spread
            # calibration"): fit on VALID dpmpp-25 ensembles, apply to the
            # test dpmpp-25 members — the serving-default candidate
            vm_d, _, tr_d = run_sampler(
                "dpmpp_sampler", 25, g.guidance_scale, 0.0, seed=6, cond_set=vcond
            )
            alpha_d = fit_spread_scale(vm_d, truth_val, rule="crps")
            key = "dpmpp25_w3_cal_crps"
            results[key] = metrics(apply_spread_scale(dpmpp_test, alpha_d))
            results[key]["alpha"] = round(alpha_d, 4)
            results[key]["val_run_s"] = round(tr_d, 3)
            checkpoint_results()
            nrm = results[key]["normalized"]
            print(key, f"alpha={alpha_d:.3f}", "crps:", nrm["crps"],
                  "spread/skill:", nrm["spread_skill"])

    if not args.skip_pc:
        pc, tc, tr = run_sampler(
            "pc_sampler", 1000, g.guidance_scale, chunk_dates=args.pc_chunk_dates
        )
        results["pc1000_w3"] = metrics(pc)
        results["pc1000_w3"]["compile_s"] = round(tc, 2)
        results["pc1000_w3"]["run_s"] = round(tr, 3)
        print("PC-1000 w=3:", json.dumps(results["pc1000_w3"], indent=2)[:400])

    checkpoint_results()
    print("wrote", out_path)

    # markdown fragment for BASELINE.md
    rows = []
    base_rows = ("pc1000_w3", "edm_w3", "edm_w0", "edm_w7")
    sweep_rows = sorted(
        n for n in results
        if isinstance(results.get(n), dict) and "normalized" in results[n]
        and n not in base_rows
    )
    for name in (*base_rows, *sweep_rows):
        r = results.get(name)
        if not r:
            continue
        nrm = r["normalized"]
        rows.append(
            f"| {name} | {nrm['crps']:.4f} | {nrm['rmse_mean']:.4f} | "
            f"{nrm['spread_skill']:.3f} | {r.get('spectrum_log_mse', float('nan')):.3f} | "
            f"{r.get('run_s', '')} |"
        )
    print("\n| sampler | CRPS | RMSE(mean) | spread/skill | spec logMSE | run_s |")
    print("|---|---|---|---|---|---|")
    print("\n".join(rows))


if __name__ == "__main__":
    main()
