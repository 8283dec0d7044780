"""Sampler perf probe: per-forward timing of the guided score evaluation on
the real chip, with stage-level splits and an XLA-flag A/B hook.

Usage:
  python scripts/perf_probe.py forward          # guided forward @ batch 26
  python scripts/perf_probe.py stages           # encoder/decoder split
  python scripts/perf_probe.py scan             # 30-step PC scan (bench tie-in)
XLA_FLAGS in the environment apply (set before launch; compile cache is keyed
by flags so each variant compiles once).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from sbgm_danra_tpu.utils.jax_env import setup_jax_env

setup_jax_env()

MEMBERS = int(os.environ.get("SBGM_PROBE_MEMBERS", "13"))
BATCH = 2 * MEMBERS  # CFG-doubled member batch
SIZE = 128


def setup():
    from bench import _sampling_setup

    return _sampling_setup(MEMBERS, SIZE, 3.0)


def _time(fn, *args, n=20):
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


def probe_forward():
    sde, cond, score_fn = setup()
    double = {k: jnp.concatenate([v, v], axis=0) for k, v in cond.items()}
    x = jnp.zeros((BATCH, SIZE, SIZE, 1))
    t = jnp.full((BATCH,), 0.5)
    fwd = jax.jit(lambda x, t: score_fn(x, t, **double))
    dt = _time(fwd, x, t)
    cost = fwd.lower(x, t).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    flops = float(cost.get("flops", 0))
    bytes_ = float(cost.get("bytes accessed", 0))
    print(json.dumps({
        "probe": "forward", "ms": round(dt * 1e3, 3),
        "gflops": round(flops / 1e9, 1), "gbytes": round(bytes_ / 1e9, 3),
        "eff_gbps": round(bytes_ / dt / 1e9, 1),
        "tflops": round(flops / dt / 1e12, 1),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
    }))


def probe_stages():
    """Time encoder alone and full model; decoder = difference (plus overlap
    error, but good enough to locate the traffic)."""
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE

    spec = ModelSpec(in_channels=6, num_classes=4, compute_dtype="bfloat16")
    model = build_score_model(spec, VESDE())
    rng = np.random.default_rng(0)
    b = BATCH
    kw = dict(
        x=jnp.zeros((b, SIZE, SIZE, 1)),
        t=jnp.full((b,), 0.5),
        y=jnp.asarray(rng.integers(1, 5, size=(b,)).astype(np.int32)),
        cond_img=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        lsm_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        topo_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kw, train=False)
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        variables,
    )

    enc = model.encoder

    def enc_fn(v, x, t):
        sub = {
            col: v[col]["encoder"] for col in v if "encoder" in v[col]
        }
        return enc.apply(
            sub, x, t, y=kw["y"], cond_img=kw["cond_img"], lsm_cond=kw["lsm_cond"],
            topo_cond=kw["topo_cond"], train=False,
        )

    def full_fn(v, x, t):
        return model.apply(v, x, t, y=kw["y"], cond_img=kw["cond_img"],
                           lsm_cond=kw["lsm_cond"], topo_cond=kw["topo_cond"], train=False)

    x, t = kw["x"], kw["t"]
    je = jax.jit(enc_fn)
    jf = jax.jit(full_fn)
    dt_enc = _time(je, variables, x, t)
    dt_full = _time(jf, variables, x, t)
    rows = {"encoder_ms": round(dt_enc * 1e3, 3),
            "full_ms": round(dt_full * 1e3, 3),
            "decoder_ms_approx": round((dt_full - dt_enc) * 1e3, 3)}
    # per-fmap cost of the encoder
    ce = je.lower(variables, x, t).compile().cost_analysis()
    if isinstance(ce, (list, tuple)):
        ce = ce[0]
    rows["encoder_gbytes"] = round(float(ce.get("bytes accessed", 0)) / 1e9, 3)
    print(json.dumps({"probe": "stages", **rows}))


def probe_scan():
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, pc_sampler

    sde, cond, score_fn = setup()
    config = SamplerConfig(num_steps=30, guidance_scale=3.0)
    run = jax.jit(lambda rng: pc_sampler(score_fn, rng, (MEMBERS, SIZE, SIZE, 1), sde, config, cond=cond))
    # TPU compiler knobs: local XLA_FLAGS parsing aborts on TPU-backend flags
    # (the axon client's XLA build doesn't know them); PJRT compiler_options
    # ride the compile request to the server-side compiler instead.
    opts = json.loads(os.environ.get("SBGM_COMPILER_OPTIONS", "null"))
    lowered = run.lower(jax.random.PRNGKey(0))
    compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()
    compiled(jax.random.PRNGKey(0)).block_until_ready()
    dts = []
    for i in range(3):
        t0 = time.perf_counter()
        compiled(jax.random.PRNGKey(i)).block_until_ready()
        dts.append(time.perf_counter() - t0)
    dt = min(dts)
    print(json.dumps({
        "probe": "scan", "members": MEMBERS, "steps_per_sec": round(30 / dt, 2),
        "ms_per_step": round(dt / 30 * 1e3, 3),
        "ms_per_forward": round(dt / 60 * 1e3, 3),
        "member_steps_per_sec": round(MEMBERS * 30 / dt, 1),
        "xla_flags": os.environ.get("XLA_FLAGS", ""),
        "compiler_options": os.environ.get("SBGM_COMPILER_OPTIONS", ""),
    }))


def probe_noattn():
    """Forward without any attention: bounds attention's share of the 4.1 ms."""
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE

    spec = ModelSpec(in_channels=6, num_classes=4, compute_dtype="bfloat16",
                     encoder_attn_stages=0, decoder_attn_blocks=0)
    model = build_score_model(spec, VESDE())
    rng = np.random.default_rng(0)
    b = BATCH
    kw = dict(
        x=jnp.zeros((b, SIZE, SIZE, 1)),
        t=jnp.full((b,), 0.5),
        y=jnp.asarray(rng.integers(1, 5, size=(b,)).astype(np.int32)),
        cond_img=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        lsm_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        topo_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kw, train=False)
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        variables,
    )
    fwd = jax.jit(lambda x, t: model.apply(variables, x, t, y=kw["y"],
                                           cond_img=kw["cond_img"], lsm_cond=kw["lsm_cond"],
                                           topo_cond=kw["topo_cond"], train=False))
    dt = _time(fwd, kw["x"], kw["t"])
    cost = fwd.lower(kw["x"], kw["t"]).compile().cost_analysis()
    if isinstance(cost, (list, tuple)):
        cost = cost[0]
    print(json.dumps({
        "probe": "noattn", "ms": round(dt * 1e3, 3),
        "gbytes": round(float(cost.get("bytes accessed", 0)) / 1e9, 3),
    }))


def _flagship_vars():
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE

    spec = ModelSpec(in_channels=6, num_classes=4, compute_dtype="bfloat16")
    model = build_score_model(spec, VESDE())
    rng = np.random.default_rng(0)
    b = BATCH
    kw = dict(
        x=jnp.zeros((b, SIZE, SIZE, 1)),
        t=jnp.full((b,), 0.5),
        y=jnp.asarray(rng.integers(1, 5, size=(b,)).astype(np.int32)),
        cond_img=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        lsm_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
        topo_cond=jnp.asarray(rng.normal(size=(b, SIZE, SIZE, 2)).astype(np.float32)),
    )
    variables = model.init({"params": jax.random.PRNGKey(0)}, **kw, train=False)
    variables = jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        variables,
    )
    return model, variables, kw


def _device_time(make_fn, make_input, k: int = 24):
    """True device time of an op: lax.scan over k stacked independent inputs
    inside ONE jitted program — sequential execution like the real model, all
    outputs materialized (no DCE), a single tunnel dispatch+sync per window.
    Returns best-of-5 window time divided by k (the ~1.3 ms dispatch is the
    only bias, amortized k-fold)."""
    fn = make_fn()
    inputs = [make_input(i) for i in range(k)]
    stacked = tuple(
        jnp.stack([inp[j] for inp in inputs]) for j in range(len(inputs[0]))
    )

    def run(xs):
        def body(carry, x):
            return carry, fn(*x)

        _, ys = jax.lax.scan(body, (), xs)
        return ys

    j = jax.jit(run)
    out = j(stacked)
    jax.block_until_ready(out)
    dts = []
    for _ in range(5):
        t0 = time.perf_counter()
        out = j(stacked)
        jax.block_until_ready(out)
        dts.append(time.perf_counter() - t0)
    return min(dts) / k


def probe_parts():
    """Per-component timings: stems, resnet stages, each decoder block, and the
    upsample op in isolation — locates the roofline gap op-by-op."""
    import flax.linen as nn
    from sbgm_danra_tpu.ops.upsample import upsample2x_bilinear

    rows = {}
    b = BATCH
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    def rand(shape, i, dtype=dt16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)

    # 8x8/s2 stem convs at their real shapes
    def conv8(cin, cout, hw, name):
        conv = nn.Conv(cout, (8, 8), strides=(2, 2), padding=((3, 3), (3, 3)),
                       use_bias=False, dtype=dt16)
        v = conv.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, cin), dt16))
        v = jax.tree.map(lambda p: p.astype(dt16), v)
        dt = _device_time(lambda: (lambda x: conv.apply(v, x)),
                          lambda i: (rand((b, hw, hw, cin), i),), k=12)
        rows[name] = round(dt * 1e3, 3)

    conv8(7, 64, SIZE, "conv1_8x8_ms")   # concat input: 1 + 2 + 2 + 2 channels
    conv8(64, 64, SIZE // 2, "conv2_8x8_ms")

    # resnet stages at real shapes
    from sbgm_danra_tpu.models.resnet import ResNetStage
    for i, (c_in, c_out, hw, stride) in enumerate(
        [(64, 64, 32, 1), (64, 128, 32, 2), (128, 256, 16, 2), (256, 512, 8, 2)]
    ):
        st = ResNetStage(c_out, 2, stride=stride, dtype=dt16)
        v = st.init(jax.random.PRNGKey(0), jnp.zeros((1, hw, hw, c_in), dt16), False)
        v = jax.tree.map(
            lambda p: p.astype(dt16) if p.dtype == jnp.float32 and p.ndim >= 2 else p, v)
        dt = _device_time(lambda: (lambda x: st.apply(v, x, False)),
                          lambda i: (rand((b, hw, hw, c_in), i),), k=12)
        rows[f"layer{i+1}_ms"] = round(dt * 1e3, 3)

    # upsample alone at the two finest shapes
    for hw, c in [(32, 64), (64, 64)]:
        dt = _device_time(lambda: upsample2x_bilinear,
                          lambda i: (rand((b, hw, hw, c), i),), k=12)
        rows[f"up2x_{hw}x{hw}x{c}_ms"] = round(dt * 1e3, 3)

    # each decoder block at its real shape (C -> C/2 pattern of the flagship)
    from sbgm_danra_tpu.models.unet import DecoderBlock
    shapes = [(4, 512, 256), (8, 256, 128), (16, 128, 64), (32, 64, 64)]
    for i, (hw, cin, cout) in enumerate(shapes):
        blk = DecoderBlock(output_channels=cout, compute_attn=(i < 2), norm="group",
                           activation="silu", compute_dtype=dt16)
        t = jnp.full((b,), 0.5)
        v = blk.init(jax.random.PRNGKey(0), jnp.zeros((b, hw, hw, cin), dt16),
                     jnp.zeros((b, hw * 2, hw * 2, cout), dt16), t)
        v = jax.tree.map(
            lambda p: p.astype(dt16) if p.dtype == jnp.float32 and p.ndim >= 2 else p, v)
        dt = _device_time(
            lambda: (lambda x, skip: blk.apply(v, x, skip, t)),
            lambda i: (rand((b, hw, hw, cin), i), rand((b, hw * 2, hw * 2, cout), i)),
            k=12,
        )
        rows[f"dec_block{i}_ms"] = round(dt * 1e3, 3)
    # final block: 64x64x64 -> 128x128x1, no norm/act/t
    blk = DecoderBlock(output_channels=1, compute_attn=False, norm="none",
                       activation="identity", compute_dtype=dt16)
    v = blk.init(jax.random.PRNGKey(0), jnp.zeros((b, 64, 64, 64), dt16), None, None)
    v = jax.tree.map(
        lambda p: p.astype(dt16) if p.dtype == jnp.float32 and p.ndim >= 2 else p, v)
    dt = _device_time(lambda: (lambda x: blk.apply(v, x, None, None)),
                      lambda i: (rand((b, 64, 64, 64), i),), k=12)
    rows["dec_final_ms"] = round(dt * 1e3, 3)
    print(json.dumps({"probe": "parts", **rows}))


def probe_cand():
    """A/B the optimization candidates at their real shapes: s2d vs direct
    stems; fused (dilated / polyphase) vs unfused upsample+conv chains."""
    from sbgm_danra_tpu.ops.fused_upsample import (
        fused_upsample_conv_dilated,
        fused_upsample_conv_phases,
    )
    from sbgm_danra_tpu.ops.stem_conv import conv8x8s2_direct, conv8x8s2_s2d
    from sbgm_danra_tpu.ops.upsample import upsample2x_bilinear

    rows = {}
    b = BATCH
    dt16 = jnp.bfloat16
    rng = np.random.default_rng(0)

    def rand(shape, dtype=dt16):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32)).astype(dtype)

    # stems
    for name, cin, cout, hw in [("conv1", 7, 64, SIZE), ("conv2", 64, 64, SIZE // 2)]:
        k8 = rand((8, 8, cin, cout))
        for impl, fn in [("direct", conv8x8s2_direct), ("s2d", conv8x8s2_s2d)]:
            dt = _device_time(lambda: (lambda x: fn(x, k8)),
                              lambda i: (rand((b, hw, hw, cin)),), k=12)
            rows[f"{name}_{impl}_ms"] = round(dt * 1e3, 3)

    # upsample+conv chains at the two finest decoder shapes
    def unfused(x, k3, bias):
        up = upsample2x_bilinear(x)
        y = jax.lax.conv_general_dilated(
            up, k3, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return y + bias

    for hw, c in [(32, 64), (64, 64)]:
        k3 = rand((3, 3, c, c))
        bias = rand((c,))
        for impl, fn in [("unfused", unfused), ("dilated", fused_upsample_conv_dilated),
                         ("phases", fused_upsample_conv_phases)]:
            dt = _device_time(lambda: (lambda x: fn(x, k3, bias)),
                              lambda i: (rand((b, hw, hw, c)),), k=12)
            rows[f"upconv{hw}_{impl}_ms"] = round(dt * 1e3, 3)
    print(json.dumps({"probe": "cand", **rows}))


def probe_train():
    """Training samples/s at SBGM_PROBE_TRAIN_BATCH (default 16): the scan
    window from bench.bench_train — batch scaling amortizes weight traffic
    the same way the sampler's member batch does."""
    from bench import bench_train

    b = int(os.environ.get("SBGM_PROBE_TRAIN_BATCH", "16"))
    sps = bench_train(batch=b)
    print(json.dumps({
        "probe": "train", "batch": b, "samples_per_sec": round(sps, 1),
    }))


def probe_multivar():
    """BASELINE scale-config 3 on hardware: the all_data 10-LR-variable
    channel count (configs/all_data.yaml -> in_channels 14 = 10 LR + 2x2
    geo; reference full_run_all_data_config.yaml:47-56). Measures the PC+CFG
    sampler at the 13-member contract batch and training at the batch-128
    sweet spot, both at 128x128 — directly comparable to the 2-LR flagship
    rows in BASELINE.md. SBGM_PROBE_LR overrides the LR-variable count."""
    from bench import bench_sampler, bench_train

    n_lr = int(os.environ.get("SBGM_PROBE_LR", "10"))
    steps_per_sec, util = bench_sampler(batch=MEMBERS, n_lr=n_lr)
    print(json.dumps({
        "probe": "multivar", "n_lr": n_lr, "members": MEMBERS,
        "pc_steps_per_sec": round(steps_per_sec, 2),
        "mxu_util": round(util, 3) if util else None,
    }))
    b = int(os.environ.get("SBGM_PROBE_TRAIN_BATCH", "128"))
    sps = bench_train(batch=b, n_lr=n_lr)
    print(json.dumps({
        "probe": "multivar", "n_lr": n_lr, "train_batch": b,
        "train_samples_per_sec": round(sps, 1),
    }))


def probe_dump():
    """Write the compiled HLO of the guided forward to /tmp/fwd_hlo.txt."""
    sde, cond, score_fn = setup()
    double = {k: jnp.concatenate([v, v], axis=0) for k, v in cond.items()}
    x = jnp.zeros((BATCH, SIZE, SIZE, 1))
    t = jnp.full((BATCH,), 0.5)
    fwd = jax.jit(lambda x, t: score_fn(x, t, **double))
    txt = fwd.lower(x, t).compile().as_text()
    with open("/tmp/fwd_hlo.txt", "w") as f:
        f.write(txt)
    print(json.dumps({"probe": "dump", "chars": len(txt)}))


def probe_fused_gn():
    """Pallas conv3x3+GN+ReLU vs the XLA chain on the decoder's two largest
    GN chains (VERDICT r2 item 5, second avenue). Shapes from the flagship
    decoder at the CFG-doubled contract batch 26 @128px: block3 (64x64, C64)
    and block2 (32x32, C128->64)."""
    from sbgm_danra_tpu.ops.fused_conv_gn import conv3x3_gn_relu, reference_chain

    dt16 = jnp.bfloat16
    cases = [
        ("block3_64px_c64", (BATCH, 64, 64, 64), 64),
        ("block2_32px_c128", (BATCH, 32, 32, 128), 64),
    ]
    for name, shape, cout in cases:
        cin = shape[-1]
        key = jax.random.PRNGKey(0)
        ks = jax.random.split(key, 5)
        w = (jax.random.normal(ks[0], (3, 3, cin, cout)) * 0.05).astype(dt16)
        b = jnp.zeros((cout,), dt16)
        gamma = jnp.ones((cout,), dt16)
        beta = jnp.zeros((cout,), dt16)

        def make_input(i):
            return (jax.random.normal(jax.random.fold_in(ks[1], i), shape).astype(dt16),)

        for impl, fn in (
            ("xla", lambda: lambda x: reference_chain(x, w, b, gamma, beta, 8)),
            ("pallas", lambda: lambda x: conv3x3_gn_relu(x, w, b, gamma, beta, 8)),
        ):
            try:
                dt = _device_time(fn, make_input, k=16)
                print(json.dumps({
                    "probe": "fused_gn", "case": name, "impl": impl,
                    "ms": round(dt * 1e3, 4),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "probe": "fused_gn", "case": name, "impl": impl,
                    "error": f"{type(e).__name__}: {str(e)[-200:]}",
                }), flush=True)


def probe_ckpt():
    """Async-checkpointing overlap on the real chip (training/checkpointing.py).

    Builds the flagship train state (the measured 803 MB full-state tree),
    then times: (a) a compiled train-step window alone, (b) a blocking save
    alone, (c) blocking save + window sequentially (the pre-r3 training-loop
    cost), (d) non-blocking save overlapped with the same window. The win is
    (c) - (d): device->host + disk time hidden behind training steps.

    Env: SBGM_PROBE_CKPT_BATCH (default 128), SBGM_PROBE_CKPT_ITERS (default
    400 — ~7-11 s of stepping at measured batch-128 rates, same order as one
    save), SBGM_PROBE_CKPT_DIR (default a fresh tmpdir).
    """
    import shutil
    import tempfile

    from bench import _compile, _cond, _flagship
    from sbgm_danra_tpu.config import from_dict
    from sbgm_danra_tpu.training.checkpointing import CheckpointManager
    from sbgm_danra_tpu.training.state import create_train_state
    from sbgm_danra_tpu.training.train_step import make_train_step

    batch = int(os.environ.get("SBGM_PROBE_CKPT_BATCH", "128"))
    iters = int(os.environ.get("SBGM_PROBE_CKPT_ITERS", "400"))
    model, sde = _flagship(SIZE)
    cond = _cond(batch, SIZE)
    rng = np.random.default_rng(1)
    full = dict(
        x=jnp.asarray(rng.normal(size=(batch, SIZE, SIZE, 1)).astype(np.float32)),
        sdf=jnp.asarray(rng.uniform(size=(batch, SIZE, SIZE, 1)).astype(np.float32)),
        **cond,
    )
    cfg = from_dict({"training": {"batch_size": batch, "learning_rate": 5e-4}})
    state = create_train_state(
        cfg, model, {k: v for k, v in full.items() if k != "sdf"}, jax.random.PRNGKey(0)
    )
    step = make_train_step(model, sde)

    # The window mimics the REAL training loop shape: per-step dispatches
    # with state donation (pipeline.py train_batches), NOT one fused scan.
    # This matters for the overlap verdict: a single long executable leaves
    # the worker thread's D2H stream no gaps to interleave into on the
    # remote-tunnel platform, while per-step dispatches (the production loop)
    # do. SBGM_PROBE_CKPT_SCAN=1 switches to the fused-scan window.
    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    if os.environ.get("SBGM_PROBE_CKPT_SCAN") == "1":
        def window_fn(state, keys):
            def body(s, key):
                s, m = step(s, full, key)
                return s, m["loss"]

            return jax.lax.scan(body, state, keys)

        scan_run = _compile(jax.jit(window_fn, donate_argnums=0).lower(state, keys))

        def run(state, keys):
            return scan_run(state, keys)
    else:
        key_list = [keys[i] for i in range(iters)]  # pre-sliced: no per-step
        jax.block_until_ready(key_list)             # indexing dispatches
        jstep = _compile(
            jax.jit(step, donate_argnums=0).lower(state, full, key_list[0])
        )

        def run(state, keys):
            loss = None
            for k in key_list:
                state, metrics = jstep(state, full, k)
                loss = metrics["loss"]
            return state, loss

    state, losses = run(state, keys)
    jax.block_until_ready(losses)

    state_bytes = sum(
        x.size * x.dtype.itemsize
        for x in jax.tree.leaves(
            (state.step, state.params, state.batch_stats, state.buffers,
             state.opt_state, state.ema_params)
        )
    )
    ckpt_dir = os.environ.get("SBGM_PROBE_CKPT_DIR") or tempfile.mkdtemp(prefix="ckpt_probe_")

    def fresh_mngr(tag):
        d = os.path.join(ckpt_dir, tag)
        shutil.rmtree(d, ignore_errors=True)
        return CheckpointManager(d)

    # warmup: one blocking + one async save on a throwaway manager pays the
    # one-time costs outside the timed sections (Orbax init, the snapshot
    # program's compile, worker-thread spinup)
    mngr = fresh_mngr("warmup")
    mngr.save(1, state, {"val_loss": 1.0}, block=True)
    mngr.save(2, state, {"val_loss": 1.0}, block=False)
    mngr.wait()
    mngr.close()

    # (a) window alone
    t0 = time.perf_counter()
    state, losses = run(state, keys)
    jax.block_until_ready(losses)
    t_window = time.perf_counter() - t0

    # (b) blocking save alone
    mngr = fresh_mngr("block")
    t0 = time.perf_counter()
    mngr.save(1, state, {"val_loss": 1.0}, block=True)
    t_save_block = time.perf_counter() - t0
    mngr.close()

    # (c) sequential: blocking save then window (pre-r3 loop shape)
    mngr = fresh_mngr("seq")
    t0 = time.perf_counter()
    mngr.save(2, state, {"val_loss": 1.0}, block=True)
    state, losses = run(state, keys)
    jax.block_until_ready(losses)
    t_seq = time.perf_counter() - t0
    mngr.close()

    # (d) overlapped: non-blocking save racing the same window
    mngr = fresh_mngr("async")
    t0 = time.perf_counter()
    mngr.save(3, state, {"val_loss": 1.0}, block=False)
    t_async_call = time.perf_counter() - t0
    state, losses = run(state, keys)
    jax.block_until_ready(losses)
    mngr.wait()
    t_overlap = time.perf_counter() - t0
    mngr.close()
    shutil.rmtree(ckpt_dir, ignore_errors=True)

    print(json.dumps({
        "probe": "ckpt", "state_mb": round(state_bytes / 1e6, 1),
        "batch": batch, "window_steps": iters,
        "window_s": round(t_window, 2),
        "save_blocking_s": round(t_save_block, 2),
        "save_async_call_s": round(t_async_call, 3),
        "seq_save_plus_window_s": round(t_seq, 2),
        "overlapped_save_plus_window_s": round(t_overlap, 2),
        "hidden_s": round(t_seq - t_overlap, 2),
    }))


def probe_loader():
    """End-to-end input-pipeline throughput (VERDICT r2 item 2).

    Sustained host-loader samples/s on production-layout stores (589x789 zarr,
    configs/flagship_synth.yaml by default) per batch size and worker count,
    with and without the C++ chunk codec — reported against the device
    ceiling (BASELINE r2: 4589 samples/s at batch 128) and the device-resident
    sampler (data/device_data.py). Run `--mode synthetic_data` first.

    Env: SBGM_PROBE_CONFIG, SBGM_PROBE_BATCHES (default "16,64,128"),
    SBGM_PROBE_LOADER_STEPS (default 6), SBGM_PROBE_DEVICE_DATA=1 to also
    time the compiled device sampler.
    """
    import sbgm_danra_tpu.data.native_codec as nc
    from sbgm_danra_tpu.config import load_config
    from sbgm_danra_tpu.data.factory import make_dataset
    from sbgm_danra_tpu.data.loader import DataLoader

    cfg = load_config(os.environ.get("SBGM_PROBE_CONFIG", "configs/flagship_synth.yaml"))
    batches = [int(b) for b in os.environ.get("SBGM_PROBE_BATCHES", "16,64,128").split(",")]
    steps = int(os.environ.get("SBGM_PROBE_LOADER_STEPS", "6"))
    ds = make_dataset(cfg, "train")
    results = {}
    nc.load_library()
    saved = nc._lib
    for codec in (True, False):
        nc._lib = saved if codec else None
        for workers in (1, 4):
            for b in batches:
                loader = DataLoader(ds, batch_size=b, shuffle=True, drop_last=True,
                                    num_workers=workers, seed=0)
                it = iter(loader)
                next(it)  # steady state: pools warm, page cache hot
                t0 = time.perf_counter()
                n = 0
                for _ in range(steps):
                    try:
                        next(it)
                        n += b
                    except StopIteration:
                        break
                dt = time.perf_counter() - t0
                key = f"codec={int(codec)} workers={workers} batch={b}"
                results[key] = round(n / dt, 1)
                print(json.dumps({"probe": "loader", key: results[key], "unit": "samples/s"}))
    nc._lib = saved

    if os.environ.get("SBGM_PROBE_DEVICE_DATA"):
        from sbgm_danra_tpu.data.device_data import DeviceDataLoader

        for b in batches:
            dl = DeviceDataLoader(ds, batch_size=b, seed=0,
                                  cfg_dropout_prob=cfg.classifier_free_guidance.drop_prob)
            dt = _time(dl.sample, jax.random.PRNGKey(0), n=20)
            print(json.dumps({
                "probe": "device_sampler", f"batch={b}": round(b / dt, 1),
                "unit": "samples/s", "ms_per_batch": round(dt * 1e3, 2),
            }))


if __name__ == "__main__":
    {"forward": probe_forward, "stages": probe_stages, "scan": probe_scan,
     "noattn": probe_noattn, "parts": probe_parts, "cand": probe_cand,
     "train": probe_train, "dump": probe_dump, "loader": probe_loader,
     "fused_gn": probe_fused_gn, "ckpt": probe_ckpt,
     "multivar": probe_multivar}[sys.argv[1]]()
