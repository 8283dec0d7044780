"""Layout-padding hypothesis probe (DESIGN.md section 4a follow-up).

The compiled forward's activation layouts are {3,0,2,1:T(8,128)(2,1)}: the
minor (channel) dim is tiled to 128 lanes and the sublane dim (batch) to 8
(x4 for bf16 packing within a 32-row window). The flagship's finest stages
have C=64 (half-empty lane tiles -> 2x HBM traffic) and the CFG-doubled
batch is 26 (padded toward 32). If true, a 3x3 conv at (26,64,64,64) should
run no faster than (32,64,64,64), and its space-to-depth twin at
(26,32,32,256) about 2x faster despite identical FLOPs.

Probes (each timed as n async-queued executions of one jitted op, single
sync; dispatch overlaps compute through the remote path):

  c64_vs_c256   3x3 conv (B,64,64,64)->(B,64,64,64) vs the s2d-equivalent
                2x2-kernel conv (B,32,32,256)->(B,32,32,256) [identical FLOPs]
  batch_pad     the same conv at B in {13, 16, 26, 32}

Usage: python scripts/layout_probe.py [c64|batch|all]
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _time_async(fn, *args, n=50):
    out = fn(*args)
    jax.block_until_ready(out)
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        dts.append((time.perf_counter() - t0) / n)
    return min(dts)


def _conv(x, k, pad):
    return lax.conv_general_dilated(
        x, k, (1, 1), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def probe_c64():
    rng = np.random.default_rng(0)
    rows = {}
    b = 26
    x = jnp.asarray(rng.normal(size=(b, 64, 64, 64)).astype(np.float32)).astype(jnp.bfloat16)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32)).astype(jnp.bfloat16)
    f = jax.jit(lambda x: _conv(x, k3, 1))
    rows["conv3x3_b26_64x64x64_ms"] = round(_time_async(f, x) * 1e3, 4)

    # s2d twin: same map on the 2x2 space-to-depth grid. A SAME 3x3 conv on
    # the fine grid is exactly a VALID 2x2-tap conv over the padded coarse
    # grid with a (2,2,4C,4C) phase-rearranged kernel; for bandwidth we only
    # need the shape class, so use a random kernel of that shape.
    xs = jnp.asarray(rng.normal(size=(b, 32, 32, 256)).astype(np.float32)).astype(jnp.bfloat16)
    k2 = jnp.asarray(rng.normal(size=(2, 2, 256, 256)).astype(np.float32)).astype(jnp.bfloat16)
    g = jax.jit(lambda x: _conv(x, k2, 1)[:, :32, :32, :])
    rows["conv2x2_b26_32x32x256_ms"] = round(_time_async(g, xs) * 1e3, 4)
    print(json.dumps({"probe": "c64_vs_c256", **rows}))


def probe_batch():
    rng = np.random.default_rng(0)
    rows = {}
    k3 = jnp.asarray(rng.normal(size=(3, 3, 64, 64)).astype(np.float32)).astype(jnp.bfloat16)
    for b in (13, 16, 26, 32):
        x = jnp.asarray(rng.normal(size=(b, 64, 64, 64)).astype(np.float32)).astype(jnp.bfloat16)
        f = jax.jit(lambda x: _conv(x, k3, 1))
        rows[f"conv3x3_b{b}_ms"] = round(_time_async(f, x) * 1e3, 4)
    print(json.dumps({"probe": "batch_pad", **rows}))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("c64", "all"):
        probe_c64()
    if mode in ("batch", "all"):
        probe_batch()
