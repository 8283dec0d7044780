"""Full-DANRA-domain sampling on real hardware (BASELINE config 4).

Measures, on the actual TPU:

1. ``edm18``        — one compiled 589x789 -> 608x800 EDM-18 reverse scan
                      (34 NFE, CFG doubled batch) at the reference attention
                      placement (2 coarsest stages); wall time + HBM peak.
2. ``edm18_attn3``  — same with attention one stage finer (76x100 = 7,600
                      tokens, beyond what the reference permits itself:
                      /root/reference/sbgm/score_unet.py:393-397,780 restricts
                      attention because dense attention is "very expensive")
                      through the Pallas flash backend.
3. ``flash_133k``   — a single attention op at 133,120 tokens (above the
                      stride-2 feature map's 121,600): Pallas flash succeeds in O(S) memory
                      (time reported); the dense XLA path needs a 133k^2 score
                      matrix (~35 GB in bf16) and is expected to fail — the
                      failure is caught and reported.

Numbers land in BASELINE.md. Usage: python scripts/full_domain_bench.py [mode]
with mode in {edm18, edm18_attn3, flash_133k, all}.
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


def _hbm_peak_mb():
    try:
        stats = jax.local_devices()[0].memory_stats()
        return round(stats.get("peak_bytes_in_use", 0) / 1e6, 1)
    except Exception:
        return None


def _flagship(attn_stages: int, backend: str):
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE

    spec = ModelSpec(
        in_channels=6,
        num_classes=4,
        compute_dtype="bfloat16",
        attention_backend=backend,
        encoder_attn_stages=attn_stages,
        decoder_attn_blocks=2,
        # DESIGN 4a: the fuse_head verdict is shape-dependent — A/B it here
        fuse_head=os.environ.get("SBGM_BENCH_FUSE_HEAD", "0") == "1",
    )
    sde = VESDE()
    return build_score_model(spec, sde), sde


def run_full_domain(label: str, attn_stages: int = 2, backend: str = "xla",
                    nodes: int = 18, batch: int = 1):
    from sbgm_danra_tpu.evaluate.full_domain import pad_conditioning, padded_dims
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, edm_sampler

    model, sde = _flagship(attn_stages, backend)
    target = padded_dims(*DOMAIN)
    rng = np.random.default_rng(0)
    cond = {
        "y": jnp.asarray(rng.integers(1, 5, size=(batch,)).astype(np.int32)),
        "cond_img": jnp.asarray(
            rng.normal(size=(batch, *DOMAIN, 2)).astype(np.float32)),
        "lsm_cond": jnp.asarray(
            (rng.random((batch, *DOMAIN, 2)) > 0.5).astype(np.float32)),
        "topo_cond": jnp.asarray(
            rng.normal(size=(batch, *DOMAIN, 2)).astype(np.float32)),
    }
    cond = pad_conditioning(cond, target)
    shape = (batch, target[0], target[1], 1)

    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        x=jnp.zeros(shape), t=jnp.zeros((batch,)), train=False,
        **{k: v for k, v in cond.items()},
    )
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        variables,
    )

    def score_fn(x, t, **kw):
        return model.apply(variables, x, t, **kw, train=False)

    config = SamplerConfig(num_steps=nodes, guidance_scale=3.0, s_churn=14.0)
    run = jax.jit(lambda key, c: edm_sampler(score_fn, key, shape, sde, config, cond=c))
    t0 = time.perf_counter()
    from sbgm_danra_tpu.compile_options import compile_lowered

    compiled = compile_lowered(run.lower(jax.random.PRNGKey(0), cond))
    compile_s = time.perf_counter() - t0
    out = compiled(jax.random.PRNGKey(0), cond)
    jax.block_until_ready(out)
    dts = []
    for i in range(2):
        t0 = time.perf_counter()
        out = compiled(jax.random.PRNGKey(i + 1), cond)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    field = np.asarray(out)[:, : DOMAIN[0], : DOMAIN[1], 0]
    print(json.dumps({
        "bench": label, "domain": f"589x789->{target[0]}x{target[1]}", "nodes": nodes,
        "nfe": 2 * (nodes - 1), "cfg": True, "batch": batch,
        "attn_stages": attn_stages, "backend": backend,
        "wall_s": round(min(dts), 3), "compile_s": round(compile_s, 1),
        "hbm_peak_mb": _hbm_peak_mb(),
        "finite": bool(np.isfinite(field).all()),
        "field_std": round(float(field.std()), 3),
    }))


def run_flash_133k():
    """One attention op at the full-domain stride-2 token count."""
    s, heads, dim = 320 * 416, 4, 16
    rng = jax.random.PRNGKey(0)
    q = jax.random.normal(rng, (1, s, heads, dim), jnp.bfloat16)
    k = jax.random.normal(rng, (1, s, heads, dim), jnp.bfloat16)
    v = jax.random.normal(rng, (1, s, heads, dim), jnp.bfloat16)

    from sbgm_danra_tpu.ops.flash_attention import flash_attention

    fa = jax.jit(flash_attention)
    out = fa(q, k, v)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = fa(q, k, v)
    jax.block_until_ready(out)
    flash_s = time.perf_counter() - t0

    dense_error = None
    dense_s = None
    try:
        dn = jax.jit(lambda q, k, v: jax.nn.dot_product_attention(q, k, v))
        o2 = dn(q, k, v)
        jax.block_until_ready(o2)
        t0 = time.perf_counter()
        o2 = dn(q, k, v)
        jax.block_until_ready(o2)
        dense_s = round(time.perf_counter() - t0, 3)
    except Exception as e:  # expected: ~35 GB score matrix
        dense_error = f"{type(e).__name__}: {str(e)[:160]}"
    print(json.dumps({
        "bench": "flash_133k", "tokens": s, "heads": heads, "head_dim": dim,
        "flash_s": round(flash_s, 3), "hbm_peak_mb": _hbm_peak_mb(),
        "dense_s": dense_s, "dense_error": dense_error,
        "finite": bool(np.isfinite(np.asarray(out, np.float32)).all()),
    }))


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "all"
    if mode in ("edm18", "all"):
        run_full_domain("full_domain_edm18", attn_stages=2, backend="pallas")
    if mode in ("edm18_attn3", "all"):
        run_full_domain("full_domain_edm18_attn3", attn_stages=3, backend="pallas")
    if mode in ("flash_133k", "all"):
        run_flash_133k()
