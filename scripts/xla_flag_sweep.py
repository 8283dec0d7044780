"""XLA TPU flag sweep over the guided-forward probe (DESIGN.md section 4a).

Each variant launches scripts/perf_probe.py forward in a child process with
XLA_FLAGS set before interpreter start (flags are compile-time; the
persistent cache keys on them, so each variant compiles once ever). Unknown
flags make XLA abort — those variants are reported as failed, not fatal.

Usage: python scripts/xla_flag_sweep.py [probe]   (default: forward)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

VARIANTS = {
    "baseline": "",
    # bigger scoped VMEM lets the fusion emitter keep larger producer chains
    # resident (default 16 MiB on v5e)
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    # async / latency-hiding scheduler aggressiveness
    "lhs": "--xla_latency_hiding_scheduler_rerun=2",
    # flatten+unroll the sampler scan body less conservatively
    "license_to_fuse": "--xla_tpu_licm_size_inflation_ratio=2.0",
}


def main():
    probe = sys.argv[1] if len(sys.argv) > 1 else "forward"
    here = os.path.dirname(os.path.abspath(__file__))
    results = {}
    for name, flags in VARIANTS.items():
        env = dict(os.environ)
        if flags:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
        else:
            env.pop("XLA_FLAGS", None)
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
    best = min(
        (r for r in results.values() if isinstance(r, dict) and "ms" in r),
        key=lambda r: r["ms"], default=None,
    )
    print(json.dumps({"best": best}))


if __name__ == "__main__":
    main()
