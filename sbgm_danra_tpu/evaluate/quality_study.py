"""Sampler quality study: PC vs EDM on synthetic regimes with EXACT scores.

The round-1 EDM evidence came from a tiny trained debug model, which entangles
model error with sampler error. Here the score function is analytic, so the
study isolates the question that decides the fast path: does a low-NFE EDM
reverse pass reproduce the target distribution as faithfully as the reference's
1000-step predictor-corrector loop (sbgm/score_sampling.py:136-230, default
n_timesteps=1000 in default_config.yaml)?

Three regimes, each with a closed-form noised score under the VE SDE
(x_t = x_0 + sigma(t) z):

- ``unimodal``:   iid pixels  ~ N(mu, s^2)
- ``bimodal``:    iid pixels  ~ 0.5 N(-m, s^2) + 0.5 N(+m, s^2)  (multimodality)
- ``correlated``: stationary Gaussian field with Gaussian spectral covariance
                  (spatially smooth fields; score via FFT diagonalization)

Regime scaling matters: every reverse-only sampler (EM, EDM, the prob-flow
ODE) starts from N(0, sigma_max^2) with sigma_max = sigma(1) ~ 9.85 for the
reference's sigma = 25 VE SDE — an APPROXIMATION to the true noised marginal
that is excellent only while the data scale is small against sigma_max. The
production data contract guarantees that (transforms z-score every field,
SURVEY.md L3), so the headline regimes here are scaled to it (pixel std ~ 1).
The ``*_prior_stress`` regimes deliberately violate it (a spectral mode with
std ~ 2.6x sigma_max, a mean offset of sigma_max/10): there the Langevin
corrector makes pc_sampler self-correcting while EM/EDM inherit the prior's
coverage gap — measured in BASELINE.md, and the reason PC stays the default
for un-normalized or extreme-tailed fields.

Metrics per (regime, sampler): ensemble CRPS against held-out truth draws,
marginal mean/std bias, spread-skill ratio, and rank-histogram deviation from
uniform (all on M-member ensembles).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from sbgm_danra_tpu.evaluate.crps import crps_ensemble
from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
from sbgm_danra_tpu.sde import VESDE

Array = jax.Array


# ---------------------------------------------------------------- regimes


@dataclasses.dataclass(frozen=True)
class Regime:
    name: str
    score_fn: Callable  # (x, t, **kw) -> exact noised score
    sample_truth: Callable  # (key, shape) -> draws from the target
    mean: float
    std: float


def gaussian_regime(
    mu: float = 0.2, s: float = 1.0, sde: VESDE = VESDE(), name: str = "unimodal"
) -> Regime:
    def score(x, t, **kw):
        var = s**2 + sde.marginal_prob_std(t).reshape((-1,) + (1,) * (x.ndim - 1)) ** 2
        return -(x - mu) / var

    def truth(key, shape):
        return mu + s * jax.random.normal(key, shape)

    return Regime(name, score, truth, mu, s)


def bimodal_regime(m: float = 1.0, s: float = 0.5, sde: VESDE = VESDE()) -> Regime:
    """0.5 N(-m, s^2) + 0.5 N(+m, s^2) per pixel; the noised score follows the
    posterior-weighted component scores (responsibilities via tanh)."""

    def score(x, t, **kw):
        var = s**2 + sde.marginal_prob_std(t).reshape((-1,) + (1,) * (x.ndim - 1)) ** 2
        # responsibilities: w_+ - w_- = tanh(m x / var) for symmetric weights
        r = jnp.tanh(m * x / var)
        mean_post = r * m
        return -(x - mean_post) / var

    def truth(key, shape):
        k1, k2 = jax.random.split(key)
        sign = jnp.where(jax.random.bernoulli(k1, 0.5, shape), 1.0, -1.0)
        return sign * m + s * jax.random.normal(k2, shape)

    std = float(np.sqrt(m**2 + s**2))
    return Regime("bimodal", score, truth, 0.0, std)


def correlated_regime(
    size: int = 16,
    ell: float = 0.5,
    amp: float = 1.0,
    sde: VESDE = VESDE(),
    name: str = "correlated",
) -> Regime:
    """Stationary periodic Gaussian field: covariance diagonal in Fourier
    space with spectrum S(k) = amp^2 * g(k)/mean(g), g a Gaussian bump. The
    noised score is -F^-1[ F(x) / (S(k) + sigma_t^2) ]."""
    kx = np.fft.fftfreq(size)[:, None]
    ky = np.fft.fftfreq(size)[None, :]
    g = np.exp(-((kx**2 + ky**2)) * (ell * size / 2.0) ** 2)
    spec = amp**2 * g / g.mean()  # E[pixel variance] = amp^2
    spec_j = jnp.asarray(spec, jnp.float32)

    def score(x, t, **kw):
        sig2 = sde.marginal_prob_std(t).reshape((-1,) + (1,) * (x.ndim - 1)) ** 2
        xf = jnp.fft.fft2(x[..., 0].astype(jnp.complex64))
        sf = xf / (spec_j + sig2[..., 0])
        return -jnp.real(jnp.fft.ifft2(sf))[..., None].astype(x.dtype)

    def truth(key, shape):
        # color white noise by sqrt(S) in Fourier space
        z = jax.random.normal(key, shape)
        zf = jnp.fft.fft2(z[..., 0].astype(jnp.complex64))
        xf = zf * jnp.sqrt(spec_j)
        return jnp.real(jnp.fft.ifft2(xf))[..., None].astype(z.dtype)

    return Regime(name, score, truth, 0.0, amp)


# ---------------------------------------------------------------- metrics


def rank_histogram_deviation(members: np.ndarray, truths: np.ndarray) -> float:
    """Max absolute deviation of the rank histogram from uniform, as a
    fraction of the uniform bin mass. members: (M, ...), truths: (K, ...)."""
    m = members.reshape(members.shape[0], -1)  # (M, P)
    t = truths.reshape(truths.shape[0], -1)  # (K, P)
    ranks = (t[:, None, :] > m[None, :, :]).sum(axis=1).ravel()  # 0..M
    hist = np.bincount(ranks, minlength=m.shape[0] + 1).astype(np.float64)
    hist /= hist.sum()
    uniform = 1.0 / (m.shape[0] + 1)
    return float(np.abs(hist - uniform).max() / uniform)


def evaluate_ensemble(members: np.ndarray, truths: np.ndarray, regime: Regime) -> Dict[str, float]:
    """members: (M, H, W, 1) ensemble; truths: (K, H, W, 1) independent draws."""
    crps_vals = [float(crps_ensemble(members, t).mean()) for t in truths]
    ens_mean = members.mean(axis=0)
    rmse = float(np.sqrt(((ens_mean - truths) ** 2).mean()))
    spread = float(members.std(axis=0, ddof=1).mean())
    return {
        "crps": float(np.mean(crps_vals)),
        "mean_bias": float(members.mean() - regime.mean),
        "std_ratio": float(members.std() / regime.std),
        "spread_skill": spread / max(rmse, 1e-12),
        "rank_dev": rank_histogram_deviation(members, truths),
    }


# ---------------------------------------------------------------- study


SAMPLER_GRID: Sequence[Dict] = (
    {"label": "pc_1000", "sampler": "pc_sampler", "num_steps": 1000, "nfe": 2000},
    {"label": "pc_100", "sampler": "pc_sampler", "num_steps": 100, "nfe": 200},
    {"label": "em_1000", "sampler": "em_sampler", "num_steps": 1000, "nfe": 1000},
    {"label": "edm_18", "sampler": "edm_sampler", "num_steps": 18, "nfe": 34},
    {"label": "edm_35", "sampler": "edm_sampler", "num_steps": 35, "nfe": 68},
    {"label": "edm_35_churn", "sampler": "edm_sampler", "num_steps": 35, "nfe": 68,
     "s_churn": 14.0},
    {"label": "edm_50", "sampler": "edm_sampler", "num_steps": 50, "nfe": 98},
    {"label": "dpmpp_25", "sampler": "dpmpp_sampler", "num_steps": 25, "nfe": 24},
    {"label": "dpmpp_35", "sampler": "dpmpp_sampler", "num_steps": 35, "nfe": 34},
)


def default_regimes(size: int = 16, sde: VESDE = VESDE(), stress: bool = True):
    """Headline regimes scaled to the z-scored data contract (pixel std ~ 1,
    all spectral modes well inside sigma_max ~ 9.85), plus the deliberate
    prior-misspecification stress cases (see module docstring)."""
    regimes = [
        gaussian_regime(sde=sde),
        bimodal_regime(sde=sde),
        correlated_regime(size=size, sde=sde),
    ]
    if stress:
        regimes += [
            # mean offset sigma_max/10, std 2: visible init-coverage bias
            gaussian_regime(mu=1.0, s=2.0, sde=sde, name="unimodal_prior_stress"),
            # ell=3 concentrates variance into a mode with std ~ 26 > sigma_max
            correlated_regime(size=size, ell=3.0, amp=2.0, sde=sde,
                              name="correlated_prior_stress"),
        ]
    return tuple(regimes)


def run_study(
    n_members: int = 64,
    size: int = 16,
    n_truths: int = 256,
    seed: int = 0,
    sampler_grid: Sequence[Dict] = SAMPLER_GRID,
    regimes: Sequence[Regime] = (),
) -> Dict[str, Dict[str, Dict[str, float]]]:
    sde = VESDE()
    regimes = regimes or default_regimes(size=size, sde=sde)
    key = jax.random.PRNGKey(seed)
    out: Dict[str, Dict[str, Dict[str, float]]] = {}
    for regime in regimes:
        key, kt = jax.random.split(key)
        truths = np.asarray(regime.sample_truth(kt, (n_truths, size, size, 1)))
        row: Dict[str, Dict[str, float]] = {}
        for spec in sampler_grid:
            sampler = get_sampler(spec["sampler"])
            cfg = SamplerConfig(
                num_steps=spec["num_steps"], s_churn=spec.get("s_churn", 0.0)
            )
            key, ks = jax.random.split(key)
            members = np.asarray(
                jax.jit(
                    lambda r, f=sampler, c=cfg: f(
                        regime.score_fn, r, (n_members, size, size, 1), sde, c
                    )
                )(ks)
            )
            row[spec["label"]] = {
                **evaluate_ensemble(members, truths, regime), "nfe": spec["nfe"],
            }
        out[regime.name] = row
    return out


def format_table(results: Dict[str, Dict[str, Dict[str, float]]]) -> str:
    lines = []
    for regime, rows in results.items():
        lines.append(f"\n### {regime}")
        lines.append(
            "| sampler | NFE | CRPS | mean bias | std ratio | spread/skill | rank dev |"
        )
        lines.append("|---|---|---|---|---|---|---|")
        for label, m in rows.items():
            lines.append(
                f"| {label} | {int(m['nfe'])} | {m['crps']:.4f} | "
                f"{m['mean_bias']:+.4f} | {m['std_ratio']:.4f} | "
                f"{m['spread_skill']:.3f} | {m['rank_dev']:.3f} |"
            )
    return "\n".join(lines)
