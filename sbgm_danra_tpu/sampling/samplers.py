"""Reverse-SDE samplers as single compiled lax.scan programs.

TPU-native re-design of the reference's Python-loop samplers
(sbgm/score_sampling.py:63-300). Semantics preserved:

- Euler-Maruyama (reference :63-127): x_1 ~ N(0, sigma(1)^2), uniform time grid
  linspace(1 -> eps), mean update x + g^2 s dt, noise sqrt(dt) g z; the returned
  sample is the final noiseless mean. (The reference hardcodes a 32x32 init
  shape — a latent bug; here the shape is explicit.)
- Predictor-corrector (reference :136-230): per step a Langevin corrector with
  step size 2 (snr * ||z|| / ||grad||)^2 where ||grad|| is the batch-mean score
  norm (:200-204, batch-coupled scalar exactly as in the reference), then an EM
  predictor; 2 score evaluations per step.
- Probability-flow ODE (reference :239-300): dx/dt = -1/2 g(t)^2 s(x, t),
  integrated 1 -> eps. The reference wraps scipy RK45 *and silently drops all
  conditioning* (:281-287); here the ODE is a fixed-step RK4/Heun scan WITH
  conditioning, plus an adaptive-RK45 variant under lax.while_loop.

Every sampler traces to one XLA program: no host round-trips between the
num_steps * (1..2) UNet evaluations that dominate the system's compute
(SURVEY.md §3.2). Member-parallel ensembles vmap/shard over these functions
(sbgm_danra_tpu.parallel.ensemble).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sbgm_danra_tpu.sampling.guidance import apply_guidance
from sbgm_danra_tpu.sde import VESDE, VPSDE

Array = jax.Array
ScoreFn = Callable[..., Array]


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    """Static sampler hyperparameters (reference config sampler: block)."""

    num_steps: int = 1000
    eps: float = 1e-3
    snr: float = 0.16
    guidance_scale: Optional[float] = None
    guidance_scale_max: Optional[float] = None
    ode_method: str = "rk4"  # rk4 | heun | rk45
    rtol: float = 1e-5
    atol: float = 1e-5
    # EDM (Karras) sampler knobs
    edm_rho: float = 7.0
    s_churn: float = 0.0  # stochastic churn; 0 = deterministic (VE only)


def _bcast(v: Array, ndim: int) -> Array:
    return v.reshape((-1,) + (1,) * (ndim - 1))


def _prepare(score_fn: ScoreFn, config: SamplerConfig) -> ScoreFn:
    return apply_guidance(score_fn, config.guidance_scale, config.guidance_scale_max)


def _init_x(rng: Array, shape: Sequence[int], sde) -> Array:
    return jax.random.normal(rng, tuple(shape), jnp.float32) * sde.prior_std()


def em_sampler(
    score_fn: ScoreFn,
    rng: Array,
    shape: Sequence[int],
    sde: VESDE | VPSDE = VESDE(),
    config: SamplerConfig = SamplerConfig(),
    cond: Optional[Dict[str, Array]] = None,
) -> Array:
    """Euler-Maruyama reverse-SDE sampler; one scan, one NFE per step."""
    cond = cond or {}
    guided = _prepare(score_fn, config)
    init_rng, loop_rng = jax.random.split(rng)
    x = _init_x(init_rng, shape, sde)
    b = shape[0]
    time_steps = jnp.linspace(1.0, config.eps, config.num_steps)
    dt = (1.0 - config.eps) / max(config.num_steps - 1, 1)

    def step(carry, t):
        x, _, key = carry
        key, zkey = jax.random.split(key)
        bt = jnp.full((b,), t, jnp.float32)
        g = sde.diffusion_coeff(bt)
        score = guided(x, bt, **cond)
        # reverse-time Euler: x <- x + (g^2 s - f) dt + g sqrt(dt) z
        # (f == 0 for VE, matching the reference exactly; VP carries its drift)
        mean_x = x + (_bcast(g**2, x.ndim) * score - sde.drift(x, bt)) * dt
        z = jax.random.normal(zkey, x.shape, x.dtype)
        x_next = mean_x + jnp.sqrt(dt) * _bcast(g, x.ndim) * z
        # final mean rides the carry — stacking per-step means as scan outputs
        # would stream num_steps full fields through HBM for nothing
        return (x_next, mean_x, key), None

    (_, mean_x, _), _ = jax.lax.scan(step, (x, x, loop_rng), time_steps)
    return mean_x


def pc_sampler(
    score_fn: ScoreFn,
    rng: Array,
    shape: Sequence[int],
    sde: VESDE | VPSDE = VESDE(),
    config: SamplerConfig = SamplerConfig(),
    cond: Optional[Dict[str, Array]] = None,
) -> Array:
    """Predictor-corrector sampler (Langevin + EM); two NFE per step."""
    cond = cond or {}
    guided = _prepare(score_fn, config)
    init_rng, loop_rng = jax.random.split(rng)
    x = _init_x(init_rng, shape, sde)
    b = shape[0]
    d = 1
    for s in shape[1:]:
        d *= s
    noise_norm = jnp.sqrt(jnp.float32(d))
    time_steps = jnp.linspace(1.0, config.eps, config.num_steps)
    dt = (1.0 - config.eps) / max(config.num_steps - 1, 1)

    def step(carry, t):
        x, _, key = carry
        key, ck, pk = jax.random.split(key, 3)
        bt = jnp.full((b,), t, jnp.float32)

        # Corrector: Langevin MCMC with SNR-matched step size; the grad norm is
        # the batch mean, making the step size a scalar shared across the batch
        # (reference :200-204).
        grad = guided(x, bt, **cond)
        grad_norm = jnp.mean(
            jnp.linalg.norm(grad.reshape(grad.shape[0], -1), axis=-1)
        )
        langevin_step = 2.0 * (config.snr * noise_norm / grad_norm) ** 2
        x = (
            x
            + langevin_step * grad
            + jnp.sqrt(2.0 * langevin_step) * jax.random.normal(ck, x.shape, x.dtype)
        )

        # Predictor: Euler-Maruyama (reverse-time; f == 0 for VE).
        g = sde.diffusion_coeff(bt)
        score = guided(x, bt, **cond)
        x_mean = x + (_bcast(g**2, x.ndim) * score - sde.drift(x, bt)) * dt
        x_next = x_mean + _bcast(jnp.sqrt(g**2 * dt), x.ndim) * jax.random.normal(
            pk, x.shape, x.dtype
        )
        return (x_next, x_mean, key), None

    (_, x_mean, _), _ = jax.lax.scan(step, (x, x, loop_rng), time_steps)
    return x_mean


def _ode_drift(guided, sde, cond, x, t, b):
    # probability-flow ODE: dx/dt = f(x, t) - 1/2 g(t)^2 s(x, t)
    bt = jnp.full((b,), t, jnp.float32)
    g2 = sde.diffusion_coeff(bt) ** 2
    return sde.drift(x, bt) - 0.5 * _bcast(g2, x.ndim) * guided(x, bt, **cond)


def ode_sampler(
    score_fn: ScoreFn,
    rng: Array,
    shape: Sequence[int],
    sde: VESDE | VPSDE = VESDE(),
    config: SamplerConfig = SamplerConfig(),
    cond: Optional[Dict[str, Array]] = None,
    z: Optional[Array] = None,
) -> Array:
    """Probability-flow ODE sampler, deterministic given the latent z.

    Fixes the reference's unconditioned ODE wrapper (score_sampling.py:286):
    conditioning is applied on every evaluation. ``config.ode_method`` selects
    fixed-step 'rk4'/'heun' scans or adaptive 'rk45'.
    """
    cond = cond or {}
    guided = _prepare(score_fn, config)
    x = _init_x(rng, shape, sde) if z is None else z
    b = shape[0]
    drift = lambda x, t: _ode_drift(guided, sde, cond, x, t, b)

    if config.ode_method == "rk45":
        x, converged = _rk45_adaptive(
            drift, x, 1.0, config.eps, config.rtol, config.atol
        )
        jax.lax.cond(
            converged,
            lambda: None,
            lambda: jax.debug.print(
                "ode_sampler(rk45): iteration cap reached before t=eps; "
                "sample is UNCONVERGED"
            ),
        )
        return x

    time_steps = jnp.linspace(1.0, config.eps, config.num_steps)
    dt = -(1.0 - config.eps) / max(config.num_steps - 1, 1)

    if config.ode_method == "heun":

        def step(x, t):
            k1 = drift(x, t)
            x_pred = x + dt * k1
            k2 = drift(x_pred, t + dt)
            return x + 0.5 * dt * (k1 + k2), None

        # Heun needs t+dt inside the domain: iterate over all but the final node.
        x, _ = jax.lax.scan(step, x, time_steps[:-1])
        return x

    if config.ode_method == "rk4":

        def step(x, t):
            k1 = drift(x, t)
            k2 = drift(x + 0.5 * dt * k1, t + 0.5 * dt)
            k3 = drift(x + 0.5 * dt * k2, t + 0.5 * dt)
            k4 = drift(x + dt * k3, t + dt)
            return x + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4), None

        x, _ = jax.lax.scan(step, x, time_steps[:-1])
        return x

    raise ValueError(f"Unknown ode_method: {config.ode_method}")


# Dormand-Prince RK45 Butcher tableau.
_DP_C = (0.0, 1 / 5, 3 / 10, 4 / 5, 8 / 9, 1.0, 1.0)
_DP_A = (
    (),
    (1 / 5,),
    (3 / 40, 9 / 40),
    (44 / 45, -56 / 15, 32 / 9),
    (19372 / 6561, -25360 / 2187, 64448 / 6561, -212 / 729),
    (9017 / 3168, -355 / 33, 46732 / 5247, 49 / 176, -5103 / 18656),
    (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84),
)
_DP_B5 = (35 / 384, 0.0, 500 / 1113, 125 / 192, -2187 / 6784, 11 / 84, 0.0)
_DP_B4 = (
    5179 / 57600,
    0.0,
    7571 / 16695,
    393 / 640,
    -92097 / 339200,
    187 / 2100,
    1 / 40,
)


def _rk45_adaptive(drift, x0: Array, t0: float, t1: float, rtol: float, atol: float):
    """Adaptive Dormand-Prince under lax.while_loop (integrates t0 -> t1 < t0)."""

    def rk_step(x, t, h):
        ks = []
        for i in range(7):
            xi = x
            for j, a in enumerate(_DP_A[i]):
                xi = xi + h * a * ks[j]
            ks.append(drift(xi, t + _DP_C[i] * h))
        x5 = x
        x4 = x
        for k, b5, b4 in zip(ks, _DP_B5, _DP_B4):
            x5 = x5 + h * b5 * k
            x4 = x4 + h * b4 * k
        err = jnp.max(jnp.abs(x5 - x4) / (atol + rtol * jnp.maximum(jnp.abs(x), jnp.abs(x5))))
        return x5, err

    def cond_fn(state):
        _, t, _, n = state
        return jnp.logical_and(t > t1 + 1e-9, n < 10_000)

    def body_fn(state):
        x, t, h, n = state
        # integrating downward: h stays negative; clamp its magnitude only.
        h = jnp.minimum(h, -1e-5)
        h = jnp.where(t + h < t1, t1 - t, h)  # don't overshoot t1
        x_new, err = rk_step(x, t, h)
        accept = err <= 1.0
        x = jnp.where(accept, x_new, x)
        t = jnp.where(accept, t + h, t)
        # standard step-size controller
        factor = jnp.clip(0.9 * err ** (-0.2), 0.2, 5.0)
        h = h * factor
        return (x, t, h, n + 1)

    h0 = jnp.float32((t1 - t0) / 100.0)
    x, t, _, _ = jax.lax.while_loop(
        cond_fn, body_fn, (x0, jnp.float32(t0), h0, jnp.int32(0))
    )
    # converged iff integration actually reached t1; a stiff drift can burn
    # the 10k-iteration cap first and would otherwise return silently.
    return x, t <= t1 + 1e-9


def edm_sampler(
    score_fn: ScoreFn,
    rng: Array,
    shape: Sequence[int],
    sde: VESDE | VPSDE = VESDE(),
    config: SamplerConfig = SamplerConfig(num_steps=35),
    cond: Optional[Dict[str, Array]] = None,
    z: Optional[Array] = None,
) -> Array:
    """EDM sampler (Karras et al. 2022): probability-flow Heun over a
    rho-spaced sigma grid, with optional stochastic churn.

    The reference ships only the unused schedule stub
    (sbgm/score_sampling.py:304-307); this is the full sampler, the low-NFE
    path to PC-quality samples: 2(num_steps - 1) UNet evaluations — at the
    default 35 nodes that is 68 NFE versus the PC default's 2000.

    Integrates in EDM's scaled coordinates: with m(t) the SDE mean coefficient
    and shat(t) = std(t)/m(t), the change of variables xhat = x/m(t) turns the
    probability-flow ODE into dxhat/dshat = -shat * shat_score(xhat), which is
    the well-conditioned form the Karras rho-grid is designed for (the raw
    t-parametrization is stiff for VE, whose g(t)^2 spans orders of
    magnitude). The model score enters exactly via
    shat_score(xhat, t) = m(t) * score(m(t) xhat, t). For VE (m == 1) this is
    literally dx/dsigma = -sigma * score. Churn (s_churn > 0) re-noises xhat
    up the shat axis before each step; hat space has unit mean coefficient, so
    the rule is exact for both SDEs.
    """
    cond = cond or {}
    guided = _prepare(score_fn, config)
    init_rng, churn_rng = jax.random.split(rng)
    b = shape[0]

    from sbgm_danra_tpu.sde import edm_sigma_schedule

    def m_of(t):
        return sde.marginal_prob_mean_coeff(jnp.asarray(t, jnp.float32))

    shat_max = sde.prior_std() / m_of(1.0)
    shat_min = sde.marginal_prob_std(jnp.float32(config.eps)) / m_of(config.eps)
    shats = edm_sigma_schedule(config.num_steps, shat_min, shat_max, config.edm_rho)
    n_intervals = config.num_steps - 1
    gamma = min(config.s_churn / max(n_intervals, 1), 2.0**0.5 - 1.0)  # static

    # churned nodes: re-noise up to shat*(1+gamma), never above the prior
    shats_churn = jnp.minimum(shats * (1.0 + gamma), shat_max) if gamma > 0 else shats
    ts = sde.inverse_hat_std(shats)
    ts_churn = sde.inverse_hat_std(shats_churn)
    ms = m_of(ts)
    ms_churn = m_of(ts_churn)

    def shat_drift(xhat, t, m, shat):
        bt = jnp.full((b,), t, jnp.float32)
        return -shat * m * guided((m * xhat).astype(xhat.dtype), bt, **cond)

    if z is None:
        xhat = jax.random.normal(init_rng, tuple(shape), jnp.float32) * shat_max
    else:
        xhat = z / m_of(1.0)

    xs = {
        "shat": shats[:-1],
        "shat_c": shats_churn[:-1],
        "t_c": ts_churn[:-1],
        "m_c": ms_churn[:-1],
        "shat_next": shats[1:],
        "t_next": ts[1:],
        "m_next": ms[1:],
    }

    def step(carry, node):
        xhat, key = carry
        key, nkey = jax.random.split(key)
        if gamma > 0.0:
            extra = jnp.sqrt(jnp.maximum(node["shat_c"] ** 2 - node["shat"] ** 2, 0.0))
            xhat = xhat + extra * jax.random.normal(nkey, xhat.shape, xhat.dtype)
        ds = node["shat_next"] - node["shat_c"]
        k1 = shat_drift(xhat, node["t_c"], node["m_c"], node["shat_c"])
        xhat_pred = xhat + ds * k1
        k2 = shat_drift(xhat_pred, node["t_next"], node["m_next"], node["shat_next"])
        return (xhat + 0.5 * ds * (k1 + k2), key), None

    (xhat, _), _ = jax.lax.scan(step, (xhat, churn_rng), xs)
    return ms[-1] * xhat


def dpmpp_sampler(
    score_fn: ScoreFn,
    rng: Array,
    shape: Sequence[int],
    sde: VESDE | VPSDE = VESDE(),
    config: SamplerConfig = SamplerConfig(num_steps=25),
    cond: Optional[Dict[str, Array]] = None,
    z: Optional[Array] = None,
) -> Array:
    """DPM-Solver++(2M) (Lu et al. 2022): second-order multistep solver for
    the probability-flow ODE over the Karras rho-grid — ONE model evaluation
    per step, half of ``edm_sampler``'s Heun cost at equal node count.

    The reference has no counterpart (its fastest path is the unused EDM
    schedule stub, sbgm/score_sampling.py:304-307); this is the framework's
    lowest-NFE deterministic sampler: num_steps - 1 score evaluations
    (2x with CFG) versus EDM-Heun's 2(num_steps - 1) and PC's 2*num_steps.

    Works in the same hat coordinates as ``edm_sampler``: xhat = x / m(t),
    shat = std(t) / m(t), where the ODE is dxhat/dshat = (xhat - D) / shat
    with the denoiser D(xhat, t) = xhat + shat^2 * m * score(m xhat, t).
    In log-sigma time lambda = -ln shat the exact variation-of-constants
    update is xhat_{i+1} = (shat_{i+1}/shat_i) xhat_i + (1 - shat_{i+1}/
    shat_i) D_bar, with D_bar the multistep linear extrapolation of D:
    first step D_bar = D_i (first order / DDIM), afterwards
    D_bar = (1 + 1/(2r)) D_i - 1/(2r) D_{i-1}, r = h_{i-1}/h_i,
    h_i = lambda_{i+1} - lambda_i. Deterministic given the latent: churn is
    intentionally unsupported (the capstone study measured trajectory noise
    strictly harmful with a learned score — BASELINE.md, s_churn=0 default).
    """
    cond = cond or {}
    guided = _prepare(score_fn, config)
    b = shape[0]

    from sbgm_danra_tpu.sde import edm_sigma_schedule

    def m_of(t):
        return sde.marginal_prob_mean_coeff(jnp.asarray(t, jnp.float32))

    shat_max = sde.prior_std() / m_of(1.0)
    shat_min = sde.marginal_prob_std(jnp.float32(config.eps)) / m_of(config.eps)
    shats = edm_sigma_schedule(config.num_steps, shat_min, shat_max, config.edm_rho)
    ts = sde.inverse_hat_std(shats)
    ms = m_of(ts)

    if z is None:
        xhat = jax.random.normal(rng, tuple(shape), jnp.float32) * shat_max
    else:
        xhat = z / m_of(1.0)

    if config.num_steps < 2:
        return ms[-1] * xhat

    def denoise(xhat, t, m, shat):
        bt = jnp.full((b,), t, jnp.float32)
        return xhat + shat**2 * m * guided((m * xhat).astype(xhat.dtype), bt, **cond)

    lams = -jnp.log(shats)
    # Positive: shat strictly decreases along the Karras grid. Guarded so a
    # degenerate grid (shat_min == shat_max, or adjacent nodes rounding to the
    # same float32 value at extreme rho) yields a finite no-op step instead of
    # a 0/0 NaN in the multistep ratio r = h_{i-1}/h_i below.
    hs = jnp.maximum(lams[1:] - lams[:-1], 1e-12)

    # first interval: first-order (no history yet)
    d0 = denoise(xhat, ts[0], ms[0], shats[0])
    ratio0 = shats[1] / shats[0]
    xhat = ratio0 * xhat + (1.0 - ratio0) * d0
    if config.num_steps == 2:
        return ms[-1] * xhat

    xs = {
        "t": ts[1:-1],
        "m": ms[1:-1],
        "shat": shats[1:-1],
        "ratio": shats[2:] / shats[1:-1],
        # r_i = h_{i-1}/h_i for intervals i = 1..n-2
        "r": hs[:-1] / hs[1:],
    }

    def step(carry, node):
        xhat, d_prev = carry
        d = denoise(xhat, node["t"], node["m"], node["shat"])
        w = 1.0 / (2.0 * node["r"])
        d_bar = (1.0 + w) * d - w * d_prev
        xhat = node["ratio"] * xhat + (1.0 - node["ratio"]) * d_bar
        return (xhat, d), None

    (xhat, _), _ = jax.lax.scan(step, (xhat, d0), xs)
    return ms[-1] * xhat


_SAMPLERS = {
    "em_sampler": em_sampler,
    "euler_maruyama": em_sampler,
    "pc_sampler": pc_sampler,
    "ode_sampler": ode_sampler,
    "edm_sampler": edm_sampler,
    "edm": edm_sampler,
    "dpmpp_sampler": dpmpp_sampler,
    "dpmpp_2m": dpmpp_sampler,
}


def get_sampler(name: str):
    """Sampler registry keyed by the reference's config names."""
    if name not in _SAMPLERS:
        raise ValueError(f"Unknown sampler '{name}'; options: {sorted(_SAMPLERS)}")
    return _SAMPLERS[name]
