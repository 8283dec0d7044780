"""Serving-path hardware benchmark (VERDICT r2 weak 3).

Measures the InferenceEngine on the current backend: AOT warmup time, then
p50/p95 request latency through the real HTTP server for 1- and max-member
requests, for the EDM fast path and (optionally) the reference-parity PC
sampler. Replaces the reference's batch-only generation entry
(sbgm/evaluate_sbgm/generation_main.py:47-143) with measured serving numbers.

Usage:
  python scripts/serve_bench.py --config configs/flagship_synth.yaml \
      [--requests 15] [--members 8] [--skip_pc]

Requires a trained checkpoint for the config (run the flagship training
first); conditions are drawn from the test split.
"""

from __future__ import annotations

import argparse
import copy
import json
import os
import sys
import threading
import time
import urllib.request

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    t0 = time.perf_counter()
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    return time.perf_counter() - t0, body


def bench_concurrent(url, health_url, conditions, n_clients, per_client, n_members=1):
    """C client threads posting back-to-back requests; the engine's greedy
    coalescer should pack them into shared dispatches, so p95 must grow far
    slower than linearly with C (VERDICT r3 item 5)."""
    lats, errs = [], []
    lock = threading.Lock()

    def client(cid):
        for i in range(per_client):
            cond = conditions[(cid + i) % len(conditions)]
            try:
                dt, body = _post(url, {
                    "conditions": cond, "n_members": n_members,
                    "seed": 1000 * cid + i,
                })
                assert body["shape"][0] == n_members, body.get("error", body)
                with lock:
                    lats.append(dt)
            except Exception as e:  # noqa: BLE001 - record, don't kill thread
                with lock:
                    errs.append(str(e))

    with urllib.request.urlopen(health_url) as r:
        h0 = json.loads(r.read())
    t0 = time.perf_counter()
    threads = [threading.Thread(target=client, args=(c,)) for c in range(n_clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    with urllib.request.urlopen(health_url) as r:
        h1 = json.loads(r.read())
    lat = np.asarray(lats)
    d = max(1, h1["n_dispatches"] - h0["n_dispatches"])
    return {
        "clients": n_clients,
        "requests": len(lats),
        "errors": len(errs),
        "p50_s": round(float(np.percentile(lat, 50)), 4),
        "p95_s": round(float(np.percentile(lat, 95)), 4),
        "req_per_s": round(len(lats) / wall, 2),
        "rows_per_dispatch": round((h1["n_rows_served"] - h0["n_rows_served"]) / d, 2),
    }


def bench_engine(cfg, sampler_type, n_steps, members, n_requests, conditions,
                 concurrency=()):
    from http.server import ThreadingHTTPServer

    from sbgm_danra_tpu.serve import InferenceEngine, make_handler

    run_cfg = copy.deepcopy(cfg)
    run_cfg.sampler.sampler_type = sampler_type
    run_cfg.evaluation.n_steps = n_steps
    engine = InferenceEngine(run_cfg, max_members=members)
    warmup_s = engine.warmup()

    srv = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(engine))
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_port}/generate"

    out = {"sampler": sampler_type, "n_steps": n_steps, "warmup_s": round(warmup_s, 2)}
    for n_members in (1, members):
        lat = []
        for i in range(n_requests):
            cond = conditions[i % len(conditions)]
            dt, body = _post(url, {
                "conditions": cond, "n_members": n_members, "seed": i,
            })
            assert body["shape"][0] == n_members, body.get("error", body)
            lat.append(dt)
        lat = np.asarray(lat)
        out[f"m{n_members}"] = {
            "p50_s": round(float(np.percentile(lat, 50)), 4),
            "p95_s": round(float(np.percentile(lat, 95)), 4),
            "mean_s": round(float(lat.mean()), 4),
            "n": n_requests,
        }
    health = f"http://127.0.0.1:{srv.server_port}/healthz"
    for n_clients in concurrency:
        out[f"c{n_clients}"] = bench_concurrent(
            url, health, conditions, n_clients, per_client=n_requests
        )
    srv.shutdown()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/flagship_synth.yaml")
    ap.add_argument("--requests", type=int, default=15)
    ap.add_argument("--members", type=int, default=8)
    ap.add_argument("--skip_pc", action="store_true")
    ap.add_argument("--dpmpp", action="store_true",
                    help="also bench the 24-NFE dpmpp serving path")
    ap.add_argument("--concurrency", default="4,8",
                    help="comma list of concurrent client counts ('' = skip)")
    ap.add_argument("--out", default="/tmp/serve_bench.json")
    args = ap.parse_args()

    from sbgm_danra_tpu.config import load_config
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.loader import collate, extract_batch

    cfg = load_config(args.config)
    cfg.data_handling.device_dataset = False  # serving loads no train split

    ds = make_dataset(cfg, "test")
    samples = [ds.__getitem__(i, rng=np.random.default_rng((77, i)))
               for i in range(min(4, len(ds)))]
    batch = extract_batch(collate(samples), cfg.highres.variable)
    conditions = []
    for i in range(len(samples)):
        conditions.append({
            k: np.asarray(batch[k][i]).tolist()
            for k in ("y", "cond_img", "lsm_cond", "topo_cond") if k in batch
        })

    results = {"image_hw": list(np.asarray(batch["x"]).shape[1:3])}
    concurrency = tuple(int(c) for c in args.concurrency.split(",") if c)
    results["edm"] = bench_engine(
        cfg, "edm_sampler", cfg.sampler.n_timesteps, args.members,
        args.requests, conditions, concurrency=concurrency,
    )
    print(json.dumps(results["edm"]))
    if args.dpmpp:
        # 24-NFE deterministic multistep path — the serving-default candidate
        # (learned-score quality rows: flagship_quality_eval --dpmpp)
        results["dpmpp"] = bench_engine(
            cfg, "dpmpp_sampler", 25, args.members,
            args.requests, conditions, concurrency=concurrency,
        )
        print(json.dumps(results["dpmpp"]))
    if not args.skip_pc:
        results["pc"] = bench_engine(
            cfg, "pc_sampler", 1000, args.members, max(4, args.requests // 3),
            conditions,
        )
        print(json.dumps(results["pc"]))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print("wrote", args.out)


if __name__ == "__main__":
    main()
