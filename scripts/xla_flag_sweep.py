"""TPU compiler-option sweep over the sampler scan probe (DESIGN.md 4a).

Local XLA_FLAGS parsing aborts on TPU-backend flags (the axon client's XLA
build doesn't know them — parse_flags_from_env dies before any request is
sent), so TPU knobs are passed as PJRT ``compiler_options`` instead: they
ride the compile request to the server-side compiler, and the persistent
cache keys on them, so each variant compiles once ever. A variant the
server-side compiler rejects is reported as failed, not fatal.

Usage: python scripts/xla_flag_sweep.py [probe]   (default: scan)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_VMEM32 = {"xla_tpu_scoped_vmem_limit_kib": "32768"}  # the shipped r2 winner


def _with_vmem(extra):
    out = dict(_VMEM32)
    out.update(extra)
    return out


VARIANTS = {
    "baseline": None,
    # --- VMEM variants (r2 established a 24-64 MiB plateau; probe its edges) ---
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem32m": dict(_VMEM32),
    "vmem96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    # --- scheduling (all on top of the shipped vmem32m) ---
    "lhs_rerun": {"xla_latency_hiding_scheduler_rerun": "2"},
    "v32_lhs_off": _with_vmem({"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    "v32_lhs_rerun3": _with_vmem({"xla_latency_hiding_scheduler_rerun": "3"}),
    # --- fusion / loop-optimizer knobs ---
    "licm_inflate": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
    "v32_licm4": _with_vmem({"xla_tpu_licm_size_inflation_ratio": "4.0"}),
    "v32_mbl_off": _with_vmem(
        {"xla_tpu_memory_bound_loop_optimizer_options": "enabled:false"}
    ),
    "v32_nested_fusion_off": _with_vmem(
        {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"}
    ),
    "v32_rwb_off": _with_vmem({"xla_tpu_rwb_fusion": "false"}),
    "v32_dot_dot_off": _with_vmem({"xla_tpu_dot_dot_fusion": "false"}),
    "v32_dot_sr_off": _with_vmem({"xla_tpu_enable_dot_strength_reduction": "false"}),
    "v32_licm4_ddoff": _with_vmem(
        {"xla_tpu_licm_size_inflation_ratio": "4.0",
         "xla_tpu_dot_dot_fusion": "false"}
    ),
    # --- memory-space-assignment / copy heuristics ---
    "v32_msa_copy08": _with_vmem(
        {"xla_tpu_msa_inefficient_use_to_copy_ratio": "0.8"}
    ),
    "v32_async_bw2": _with_vmem(
        {"xla_tpu_async_copy_bandwidth_scaling_factor": "2.0"}
    ),
    # --- pass-level ablation (generic XLA) ---
    "v32_no_remat_pass": _with_vmem({"xla_disable_hlo_passes": "rematerialization"}),
}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("probe", nargs="?", default="scan")
    ap.add_argument("--variants", default=None,
                    help="comma-separated subset (default: all)")
    ap.add_argument("--out", default="/tmp/xla_flag_sweep_results.json",
                    help="accumulating results file (resumable)")
    args = ap.parse_args()
    probe = args.probe
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            results = json.load(f)
    selected = (
        {k: VARIANTS[k] for k in args.variants.split(",")}
        if args.variants else VARIANTS
    )
    for name, opts in selected.items():
        if name in results and "error" not in results[name]:
            print(json.dumps({name: results[name], "cached": True}), flush=True)
            continue
        env = dict(os.environ)
        if opts:
            env["SBGM_COMPILER_OPTIONS"] = json.dumps(opts)
        else:
            env.pop("SBGM_COMPILER_OPTIONS", None)
        try:
            out = subprocess.run(
                [sys.executable, os.path.join(here, "perf_probe.py"), probe],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.splitlines() if l.startswith("{")]
            results[name] = json.loads(line[-1]) if line else {
                "error": (out.stderr or "no output")[-300:]}
        except Exception as e:
            results[name] = {"error": f"{type(e).__name__}: {e}"}
        print(json.dumps({name: results[name]}), flush=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
    def _cost(r):
        return r.get("ms", r.get("ms_per_step", float("inf")))

    best = min(
        (r for r in results.values()
         if isinstance(r, dict) and ("ms" in r or "ms_per_step" in r)),
        key=_cost, default=None,
    )
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
