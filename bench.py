"""Benchmark: SDE sampler throughput of the flagship model on real hardware.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric: predictor-corrector sampler steps/sec/chip at 128x128 with
classifier-free guidance enabled (the reference's default generation workload:
pc_sampler, 1000 steps, CFG w=3 -> 4 UNet forwards per step,
sbgm/config/default_config.yaml:52-53,132-135). The reference publishes no
numbers (BASELINE.md), so vs_baseline is measured against the driver's stated
north-star: a 100-member conditional ensemble at 128x128 in <= 60 s on a v5e-8
(~13 members/chip, 1000 PC+CFG steps). vs_baseline = 60 s / projected time —
values > 1 beat the target.

Robustness contract (VERDICT r3 item 1 — the r3 artifact of record was rc=124
with an EMPTY tail because all four phases compiled cold before the single
print):
  1. The compile cache lives IN THE REPO (``.jax_cache/``, gitignored but
     on-disk) — the repo working tree survives host rotation between the
     builder/judge/driver invocations; ``/tmp`` demonstrably does not
     (r3 postmortem).
  2. The headline PC-13 phase runs FIRST; every later phase is skipped once
     the wall-clock budget (env ``SBGM_BENCH_BUDGET_S``, default 780 s,
     0 = unlimited) is more than half spent, and the JSON line is printed
     with nulls for skipped fields rather than not at all.
  3. A watchdog thread emits the partial JSON line and exits 0 if the budget
     elapses while the main thread is blocked inside a compile (signal
     handlers cannot run mid-C-call; a thread can).
  4. Progress lines go to stderr before/after every compile and measurement,
     so even a killed run leaves a diagnosable tail.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

_REPO = os.path.dirname(os.path.abspath(__file__))
# Persistent compilation cache: the first compile of a changed 128x128 scan
# over the remote path takes ~8-25 min; cache hits are seconds. Repo-local so
# it survives host rotation (see module docstring, point 1).
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_REPO, ".jax_cache")
)
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

# Without this the committed cache is useless: jax hashes the axon server's
# BUILD STRING into every key, and the server rotates between invocations
# (r3 postmortem — the judge's same-disk entries all missed). See
# utils/jax_env.py for the full rationale + safety argument.
from sbgm_danra_tpu.utils.jax_env import stabilize_tpu_cache_key

stabilize_tpu_cache_key()

_T0 = time.monotonic()
_BUDGET_S = float(os.environ.get("SBGM_BENCH_BUDGET_S", "780"))

# Result fields, updated in place as phases complete; _emit() prints whatever
# is here exactly once (main thread at the end, watchdog on budget expiry,
# signal handler on SIGTERM between phases — whoever gets there first).
_RESULT: dict = {
    "metric": "pc_sampler_steps_per_sec_per_chip_128px_cfg",
    "value": None,
    "unit": "steps/s",
    "vs_baseline": None,
    "baseline_definition": (
        "60s / projected 100-member-ensemble time on 8 chips (>1 beats target)"
    ),
    "projected_100member_ensemble_s_v5e8": None,
    "measured_100member_ensemble_s_single_chip": None,
    "projected_100member_ensemble_edm35_s_v5e8": None,
    "member_steps_per_sec_batch100": None,
    "train_samples_per_sec_per_chip_128px": None,
    "sampler_mxu_utilization_vs_v5e_peak": None,
    "sampler_mxu_utilization_batch100": None,
    "platform": None,
    "device": None,
}
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _log(msg: str) -> None:
    print(f"[bench +{time.monotonic() - _T0:6.1f}s] {msg}", file=sys.stderr, flush=True)


def _emit(reason: str) -> None:
    global _EMITTED
    with _EMIT_LOCK:
        if _EMITTED:
            return
        _EMITTED = True
    _log(f"emitting result ({reason})")
    print(json.dumps(_RESULT), flush=True)


def _remaining() -> float:
    if _BUDGET_S <= 0:
        return float("inf")
    return _BUDGET_S - (time.monotonic() - _T0)


def _watchdog() -> None:
    """Emit the partial result and exit 0 when the budget expires while the
    main thread is stuck in a compile (rc=0 + partial JSON beats the r3
    rc=124 + empty tail)."""
    if _BUDGET_S <= 0:
        return
    while True:
        left = _remaining()
        if left <= 0:
            _log("WATCHDOG: budget exhausted mid-phase — emitting partial result")
            _emit("watchdog")
            os._exit(0)
        time.sleep(min(left, 5.0))


def _compile(lowered):
    # measured TPU compile options (+10.5% sampler; DESIGN.md 4a)
    from sbgm_danra_tpu.compile_options import compile_lowered

    return compile_lowered(lowered)


def _preflight(deadline_s: float | None = None) -> None:
    """Chip-liveness check BEFORE any expensive phase (VERDICT r4 item 1b).

    The r4 artifact was all-null because another process held the TPU through
    the driver's window (CLAUDE.md: only one process may hold the chip) and
    the first device op hung silently for 780 s. One tiny jitted op with its
    own short deadline turns that failure mode into a one-line postmortem.
    The op runs in a worker thread because a hung device call cannot be
    interrupted from Python; on timeout the partial JSON is emitted and the
    process exits 0 (same contract as the watchdog).

    Deadline: the FIRST device contact after a host rotation pays the remote
    tunnel's cold-start (~90 s measured, r5) — far more than a warm dispatch
    but finite, unlike the held-chip hang (780 s+ with zero progress). The
    default 240 s separates the two; ``SBGM_PREFLIGHT_DEADLINE_S`` overrides.
    """
    if deadline_s is None:
        deadline_s = float(os.environ.get("SBGM_PREFLIGHT_DEADLINE_S", "240"))
    done = threading.Event()
    err: list = []

    def probe():
        try:
            val = float(np.asarray(jax.jit(lambda x: x + 1)(jnp.float32(41.0))))
            if val != 42.0:
                err.append(f"probe returned {val}")
        except Exception as e:  # surfaced below
            err.append(f"{type(e).__name__}: {e}")
        finally:
            done.set()

    _log(f"preflight: tiny jitted op (deadline {deadline_s:.0f}s)...")
    t0 = time.monotonic()
    threading.Thread(target=probe, daemon=True).start()
    if not done.wait(deadline_s):
        _log(
            "PREFLIGHT FAILED: device unresponsive after "
            f"{deadline_s:.0f}s — either another process holds the TPU "
            "(this platform allows one holder; check `ps` for stray python "
            "runs) or the remote platform is in an outage/rotation window "
            "(observed 2026-08-21 ~02:50: >25 min unresponsive with zero "
            "local holders — retry later). Emitting null result."
        )
        _RESULT["error"] = "device unresponsive (preflight timeout)"
        _emit("preflight-timeout")
        os._exit(0)
    if err:
        _log(f"PREFLIGHT FAILED: {err[0]}")
        _RESULT["error"] = f"preflight: {err[0]}"
        _emit("preflight-error")
        os._exit(0)
    _log(f"preflight ok in {time.monotonic() - t0:.1f}s — device is live")


def _flagship(size: int = 128, n_lr: int = 2):
    from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
    from sbgm_danra_tpu.sde import VESDE

    spec = ModelSpec(
        # reference infer_in_channels (training_utils.py:588-595): n_lr + 2*2
        # geo (the noised HR target is counted separately by the stem). n_lr=2
        # is the flagship default; 10 matches configs/all_data.yaml
        in_channels=n_lr + 4,
        num_classes=4,
        compute_dtype="bfloat16",
        # lowering knobs: identical math/params, different XLA programs
        # (tests/test_model.py::TestLoweringKnobs); env overrides let the perf
        # probes A/B them at the full-sampler level
        stem_impl=os.environ.get("SBGM_BENCH_STEM_IMPL", "direct"),
        fuse_upsample=os.environ.get("SBGM_BENCH_FUSE_UPSAMPLE", "none"),
        fuse_head=os.environ.get("SBGM_BENCH_FUSE_HEAD", "0") == "1",
    )
    sde = VESDE()
    model = build_score_model(spec, sde)
    return model, sde


def _cond(b: int, size: int, n_lr: int = 2):
    """Random conditioning, computed ON the device (a jitted program): host
    arrays would be re-shipped through the remote tunnel (~0.3 MB/s measured)
    at first use — 40 MB of batch-100 conditions is minutes of wall."""

    @jax.jit
    def make(key):
        k1, k2, k3, k4 = jax.random.split(key, 4)
        return {
            "y": jax.random.randint(k1, (b,), 1, 5, jnp.int32),
            "cond_img": jax.random.normal(k2, (b, size, size, n_lr), jnp.float32),
            "lsm_cond": (
                jax.random.uniform(k3, (b, size, size, 2)) > 0.5
            ).astype(jnp.float32),
            "topo_cond": jax.random.normal(k4, (b, size, size, 2), jnp.float32),
        }

    return _force(make(jax.random.PRNGKey(0)))


def _force(tree):
    """Ensure a pytree's producing computation has actually EXECUTED by
    fetching its smallest leaf (block_until_ready is a no-op on this remote
    platform, and an AOT executable consuming still-pending buffers from a
    jitted producer was observed to stall indefinitely)."""
    leaves = jax.tree_util.tree_leaves(tree)
    if leaves:
        np.asarray(min(leaves, key=lambda a: a.size))
    return tree


def _init_variables(model, size: int, n_lr: int):
    """model.init as ONE jitted program: weights are born on the device and
    stay there (dispatch args are buffer handles).

    The two alternatives both lose by minutes on the remote tunnel: eager
    init is ~5 min of per-op dispatches, and host-loaded weights are a one
    -time ~270 s bulk upload at first use (measured ~0.3 MB/s). A jitted
    init is a small, persistently-cacheable program that runs in seconds.
    """
    _log("jitted model.init...")
    t0 = time.monotonic()
    cond = _cond(1, size, n_lr)

    @jax.jit
    def init(key, c):
        return model.init(
            {"params": key},
            x=jnp.zeros((1, size, size, 1)), t=jnp.zeros((1,)), **c, train=False,
        )

    variables = _force(init(jax.random.PRNGKey(0), cond))
    _log(f"init done in {time.monotonic() - t0:.0f}s")
    return variables


def _sampling_setup(batch: int, size: int, cfg_scale: float, n_lr: int = 2):
    """Flagship inference setup shared by the sampler benchmarks: bf16-cast
    weights (sampling streams half the parameter bytes per forward; norm
    params stay fp32) + model + conditioning.

    The weights are returned separately and passed to the jitted programs as
    ARGUMENTS, never closed over: a closed-over array is inlined into the
    lowered module as an MLIR constant, which makes lowering + cache-key
    hashing minutes long and every cache entry ~200 MB (the whole parameter
    set rides inside the serialized executable). As arguments the module is
    O(metadata) and entries are megabytes — the difference between a warm
    driver bench finishing in seconds vs minutes per phase.

    Every stage logs before/after (VERDICT r4 item 1c: the r4 tail had a
    780 s dead zone between "phase 1/5" and the watchdog because nothing
    before _init_variables logged).
    """
    _log(f"setup: building flagship model (batch={batch})...")
    model, sde = _flagship(size, n_lr)
    _log("setup: conditioning batch (jitted on-device RNG)...")
    cond = _cond(batch, size, n_lr)
    _log("setup: conditioning ready")
    variables = _init_variables(model, size, n_lr)
    cast = jax.jit(lambda v: jax.tree.map(
        lambda p: p.astype(jnp.bfloat16) if p.dtype == jnp.float32 and p.ndim >= 2 else p,
        v,
    ))
    return sde, cond, model, _force(cast(variables))


def _time_compiled(run, variables, cond, n_rep: int = 3) -> float:
    """Compile + warm up, then best-of-n timing (the remote-dispatch path adds
    jitter that averages would fold into the device number). ``run`` takes
    (rng, variables, cond) — weights/conditions as arguments — and returns a
    SCALAR: on this remote platform ``block_until_ready`` does not actually
    block on execution (measured: 2 ms "sync" vs 150+ s true drain), so the
    only honest sync is fetching a value; a scalar costs 4 bytes of D2H."""
    _log("compiling (cache hit = seconds, cold = minutes)...")
    t0 = time.monotonic()
    compiled = _compile(run.lower(jax.random.PRNGKey(0), variables, cond))
    _log(f"compiled in {time.monotonic() - t0:.1f}s; warming up")
    warm = float(np.asarray(compiled(jax.random.PRNGKey(0), variables, cond)))
    if not np.isfinite(warm):
        raise RuntimeError(f"non-finite sampler output: {warm}")
    # Dispatches queue in order on the device, so fetching the LAST result
    # syncs the whole window — one RPC roundtrip amortized over n_rep runs.
    t0 = time.perf_counter()
    out = None
    for i in range(n_rep):
        out = compiled(jax.random.PRNGKey(i), variables, cond)
    val = float(np.asarray(out))
    if not np.isfinite(val):
        raise RuntimeError(f"non-finite sampler output: {val}")
    return (time.perf_counter() - t0) / n_rep


def _sampler_run(sampler, shape, sde, config, model):
    """(rng, variables, cond) -> scalar mean of the sample batch; big pytrees
    enter as args, the output stays 4 bytes (see _time_compiled)."""

    def run(rng, variables, cond):
        def score_fn(x, t, **kw):
            return model.apply(variables, x, t, **kw, train=False)

        return jnp.mean(sampler(score_fn, rng, shape, sde, config, cond=cond))

    return jax.jit(run)


def bench_sampler(batch: int = 13, size: int = 128, steps: int = 30, cfg_scale: float = 3.0,
                  n_lr: int = 2) -> float:
    """Time `steps` PC+CFG sampler steps; returns steps/sec for this batch."""
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, pc_sampler

    sde, cond, model, variables = _sampling_setup(batch, size, cfg_scale, n_lr)
    config = SamplerConfig(num_steps=steps, guidance_scale=cfg_scale)
    run = _sampler_run(pc_sampler, (batch, size, size, 1), sde, config, model)
    return steps / _time_compiled(run, variables, cond)


def mxu_utilization(steps_per_sec: float, batch: int = 13, size: int = 128,
                    cfg_scale: float = 3.0, n_lr: int = 2):
    """MXU utilization of the PC sampler at the measured step rate.

    XLA's cost analysis counts a scan body ONCE (not x trip-count), so take
    the FLOPs of a single guided score evaluation — CFG runs cond+uncond as
    one doubled batch — and scale by the 2 evals per PC step. A separate
    (budget-gated) compile, run AFTER the headline is already on record.
    """
    _, cond, model, variables = _sampling_setup(batch, size, cfg_scale, n_lr)
    try:
        double = {k: jnp.concatenate([v, v], axis=0) for k, v in cond.items()}
        fwd = jax.jit(
            lambda x, t, v, c: model.apply(v, x, t, **c, train=False)
        )
        _log("compiling cost-analysis forward...")
        cost = _compile(fwd.lower(
            jnp.zeros((2 * batch, size, size, 1)), jnp.zeros((2 * batch,)),
            variables, double,
        )).cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops_fwd = float(cost.get("flops", 0.0))
        if flops_fwd > 0:
            tflops = 2.0 * flops_fwd * steps_per_sec / 1e12
            return tflops / 197.0  # v5e bf16 peak ~197 TFLOP/s
    except Exception as e:
        _log(f"cost analysis unavailable ({type(e).__name__}: {e})")
    return None


def bench_edm(batch: int = 13, size: int = 128, nodes: int = 35, cfg_scale: float = 3.0):
    """Wall time of one full EDM sample batch (68 NFE vs the PC loop's 2000)."""
    from sbgm_danra_tpu.sampling.samplers import SamplerConfig, edm_sampler

    sde, cond, model, variables = _sampling_setup(batch, size, cfg_scale)
    config = SamplerConfig(num_steps=nodes, guidance_scale=cfg_scale)
    run = _sampler_run(edm_sampler, (batch, size, size, 1), sde, config, model)
    return _time_compiled(run, variables, cond)


def bench_train(batch: int = 16, size: int = 128, iters: int = 10, n_lr: int = 2):
    """Training samples/sec/chip on the flagship model."""
    from sbgm_danra_tpu.config import from_dict
    from sbgm_danra_tpu.training.state import create_train_state
    from sbgm_danra_tpu.training.train_step import make_train_step

    _log("train setup: building flagship model + conditioning...")
    model, sde = _flagship(size, n_lr)
    cond = _cond(batch, size, n_lr)

    @jax.jit
    def make_xsdf(key):
        kx, ks = jax.random.split(key)
        return (
            jax.random.normal(kx, (batch, size, size, 1), jnp.float32),
            jax.random.uniform(ks, (batch, size, size, 1), jnp.float32),
        )

    x, sdf = _force(make_xsdf(jax.random.PRNGKey(1)))
    full = dict(x=x, sdf=sdf, **cond)
    _log("train setup: model + conditioning ready; building train state...")
    cfg = from_dict({"training": {"batch_size": batch, "learning_rate": 5e-4}})
    init = {k: v for k, v in full.items() if k != "sdf"}
    state = create_train_state(
        cfg, model, init, jax.random.PRNGKey(0),
        variables=_init_variables(model, size, n_lr),
    )
    step = make_train_step(model, sde)

    # Time `iters` steps as ONE compiled lax.scan: a single dispatch+sync per
    # window. Eager-chained steps pay the remote-dispatch path per step, which
    # is where the r1 1280-1813 samples/s jitter came from (STATUS.md). The
    # batch rides as an argument (same closed-over-constants rationale as
    # _sampling_setup).
    def window(state, keys, batch_):
        def body(s, key):
            s, m = step(s, batch_, key)
            return s, m["loss"]

        return jax.lax.scan(body, state, keys)

    keys = jax.random.split(jax.random.PRNGKey(1), iters)
    _log("compiling train window...")
    t0 = time.monotonic()
    run = _compile(jax.jit(window, donate_argnums=0).lower(state, keys, full))
    _log(f"train window compiled in {time.monotonic() - t0:.1f}s")
    # sync by VALUE (np.asarray of the tiny loss vector) — block_until_ready
    # does not block on this remote platform, see _time_compiled
    state, losses = run(state, keys, full)
    if not np.isfinite(np.asarray(losses)).all():
        raise RuntimeError("non-finite training losses")
    best_dt = float("inf")
    for rep in range(3):
        t0 = time.perf_counter()
        state, losses = run(state, keys, full)
        np.asarray(losses)
        best_dt = min(best_dt, (time.perf_counter() - t0) / iters)
    return batch / best_dt


def _phase_ok(name: str) -> bool:
    """Run optional phases only while less than half the budget is spent —
    a later phase's cold compile costs about as much as the headline's, so
    half-spent is the conservative go/no-go line."""
    if _BUDGET_S <= 0:
        return True
    if time.monotonic() - _T0 > 0.5 * _BUDGET_S:
        _log(f"skipping phase '{name}' (over half the {_BUDGET_S:.0f}s budget spent)")
        return False
    return True


def main():
    threading.Thread(target=_watchdog, daemon=True).start()
    _RESULT["platform"] = jax.default_backend()
    _RESULT["device"] = str(jax.devices()[0])
    _log(
        f"platform={_RESULT['platform']} device={_RESULT['device']} "
        f"budget={_BUDGET_S:.0f}s cache={os.environ['JAX_COMPILATION_CACHE_DIR']}"
    )
    _preflight()

    try:
        # ---- headline phase FIRST: PC+CFG steps/s at the contract batch ----
        _log("phase 1/5: pc_sampler batch=13 (HEADLINE)")
        steps_per_sec = bench_sampler()
        projected_ensemble_s = 1000.0 / steps_per_sec
        _RESULT.update(
            value=round(steps_per_sec, 3),
            vs_baseline=round(60.0 / projected_ensemble_s, 3),
            projected_100member_ensemble_s_v5e8=round(projected_ensemble_s, 1),
        )
        _log(f"headline: {steps_per_sec:.1f} steps/s (vs_baseline {_RESULT['vs_baseline']})")

        # ---- optional phases, budget-gated, most- to least-cited ----
        if _phase_ok("train"):
            _log("phase 2/5: train samples/s")
            tps = bench_train()
            _RESULT["train_samples_per_sec_per_chip_128px"] = round(tps, 2)
            _log(f"train: {tps:.1f} samples/s")

        if _phase_ok("edm"):
            _log("phase 3/5: edm_sampler batch=13")
            edm_s = bench_edm()
            _RESULT["projected_100member_ensemble_edm35_s_v5e8"] = round(edm_s, 2)
            _log(f"edm35 batch wall: {edm_s:.2f}s")

        if _phase_ok("pc_batch100"):
            # Production-batch variant: batch 100 amortizes weight streaming
            # and sublane padding (DESIGN.md 4a) — +83% member throughput and
            # the honest MXU number for ensemble serving; a 100-member PC-1000
            # ensemble fits ONE chip. Headline stays batch 13 for
            # round-over-round comparison.
            _log("phase 4/5: pc_sampler batch=100")
            sps100 = bench_sampler(batch=100)
            _RESULT.update(
                measured_100member_ensemble_s_single_chip=round(1000.0 / sps100, 1),
                member_steps_per_sec_batch100=round(100 * sps100, 1),
            )
            _log(f"batch100: {100 * sps100:.0f} member-steps/s")
            if _phase_ok("mxu_batch100"):
                mxu100 = mxu_utilization(sps100, batch=100)
                _RESULT["sampler_mxu_utilization_batch100"] = (
                    round(mxu100, 3) if mxu100 else None
                )

        if _phase_ok("mxu_batch13"):
            _log("phase 5/5: MXU utilization (cost-analysis forward)")
            mxu = mxu_utilization(steps_per_sec, batch=13)
            _RESULT["sampler_mxu_utilization_vs_v5e_peak"] = (
                round(mxu, 3) if mxu else None
            )
    finally:
        # Even an exception mid-phase leaves the completed fields on record.
        _emit("main")


if __name__ == "__main__":
    main()
