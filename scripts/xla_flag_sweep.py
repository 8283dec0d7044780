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

VARIANTS = {
    "baseline": None,
    # bigger scoped VMEM lets the fusion emitter keep larger producer chains
    # resident (default 16 MiB on v5e)
    "vmem64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "vmem32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    # latency-hiding scheduler aggressiveness
    "lhs_rerun": {"xla_latency_hiding_scheduler_rerun": "2"},
    # allow bigger fusions (size-based license)
    "licm_inflate": {"xla_tpu_licm_size_inflation_ratio": "2.0"},
}


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "scan"
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for name, opts in VARIANTS.items():
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
