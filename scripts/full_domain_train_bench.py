"""Full-domain TRAINING step on real hardware (VERDICT r1 item 4).

One remat'd DSM train step of the full-width flagship at the padded DANRA
domain (589x789 -> 608x800), actually stepping on the chip — the reference's
capability envelope is training (sbgm/training.py:246-422) at 128x128 crops;
this demonstrates the full-domain batch the reference cannot touch.

Usage: python scripts/full_domain_train_bench.py [batch]   (default 2)
Prints one JSON line: wall time per step, samples/s, HBM peak, loss finite.
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

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOMAIN = (589, 789)


def main(batch: int = 2):
    from sbgm_danra_tpu.config import from_dict
    from sbgm_danra_tpu.evaluate.full_domain import pad_conditioning, padded_dims
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE
    from sbgm_danra_tpu.training.state import create_train_state
    from sbgm_danra_tpu.training.train_step import make_train_step

    spec = ModelSpec(in_channels=6, num_classes=4, compute_dtype="bfloat16")
    sde = VESDE()
    model = build_score_model(spec, sde)
    h, w = padded_dims(*DOMAIN)
    rng = np.random.default_rng(0)
    cond = {
        "y": jnp.asarray(rng.integers(1, 5, size=(batch,)).astype(np.int32)),
        "cond_img": jnp.asarray(rng.normal(size=(batch, *DOMAIN, 2)).astype(np.float32)),
        "lsm_cond": jnp.asarray((rng.random((batch, *DOMAIN, 2)) > 0.5).astype(np.float32)),
        "topo_cond": jnp.asarray(rng.normal(size=(batch, *DOMAIN, 2)).astype(np.float32)),
    }
    cond = pad_conditioning(cond, (h, w))
    full = dict(
        x=jnp.asarray(rng.normal(size=(batch, h, w, 1)).astype(np.float32)),
        sdf=jnp.asarray(rng.uniform(size=(batch, h, w, 1)).astype(np.float32)),
        **cond,
    )
    cfg = from_dict({"training": {"batch_size": batch, "learning_rate": 5e-4}})
    init = {k: v for k, v in full.items() if k != "sdf"}
    state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
    from sbgm_danra_tpu.compile_options import compile_lowered

    t0 = time.perf_counter()
    step = compile_lowered(
        jax.jit(make_train_step(model, sde, remat=True), donate_argnums=0).lower(
            state, full, jax.random.PRNGKey(1)
        )
    )
    state, m = step(state, full, jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    compile_s = time.perf_counter() - t0
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        state, m = step(state, full, jax.random.PRNGKey(2 + i))
        jax.block_until_ready(m["loss"])
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    try:
        peak = round(jax.local_devices()[0].memory_stats().get("peak_bytes_in_use", 0) / 1e6, 1)
    except Exception:
        peak = None
    print(json.dumps({
        "bench": "full_domain_train_step", "domain": f"589x789->{h}x{w}",
        "batch": batch, "remat": True, "step_s": round(dt, 3),
        "samples_per_sec": round(batch / dt, 2), "compile_s": round(compile_s, 1),
        "hbm_peak_mb": peak, "loss": float(m["loss"]),
        "loss_finite": bool(np.isfinite(float(m["loss"]))),
    }))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 2)
