"""SDE definitions and the denoising score-matching (DSM) loss.

TPU-native reimplementation of the VE-SDE math in the reference
(sbgm/score_unet.py:881-985). Everything here is a pure function of arrays so it
traces cleanly under ``jit``/``vmap``/``shard_map``; the SDE objects are hashable
static pytree-free dataclasses so they can be closed over by compiled functions.

Semantics preserved exactly from the reference:

- ``VESDE.marginal_prob_std``: sigma(t) = sqrt((sigma^(2t) - 1) / (2 ln sigma)),
  floored at ``std_eps`` (reference sbgm/score_unet.py:881-897, clamp min=1e-5).
- ``VESDE.diffusion_coeff``: g(t) = sigma^t (reference sbgm/score_unet.py:916-930).
- ``dsm_loss``: t ~ U(t_eps, 1), x_t = x + sigma(t) z,
  loss = mean_B sum_pix w_sdf * (score * sigma(t) + z)^2 with
  w_sdf = sigmoid(sdf) * (max_land - min_sea) + min_sea
  (reference sbgm/score_unet.py:936-985).

A VP SDE is provided as well ("identical VE/VP SDE marginals" is a stated parity
requirement); the reference itself only exercises VE.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp

Array = jax.Array


@dataclasses.dataclass(frozen=True)
class VESDE:
    """Variance-Exploding SDE: dx = sigma^t dW.

    Marginal p_0t(x_t | x_0) = N(x_0, sigma(t)^2 I) with
    sigma(t)^2 = (sigma^(2t) - 1) / (2 ln sigma).
    """

    sigma: float = 25.0
    std_eps: float = 1e-5

    def marginal_prob_std(self, t: Array) -> Array:
        t = jnp.asarray(t, dtype=jnp.float32)
        log_sigma = jnp.log(jnp.float32(self.sigma))
        sigma_t_sq = jnp.exp(2.0 * t * log_sigma)
        std = jnp.sqrt((sigma_t_sq - 1.0) / (2.0 * log_sigma))
        return jnp.maximum(std, self.std_eps)

    def marginal_prob_mean_coeff(self, t: Array) -> Array:
        # VE SDE leaves the mean untouched.
        return jnp.ones_like(jnp.asarray(t, dtype=jnp.float32))

    def diffusion_coeff(self, t: Array) -> Array:
        t = jnp.asarray(t, dtype=jnp.float32)
        return jnp.power(jnp.float32(self.sigma), t)

    def drift(self, x: Array, t: Array) -> Array:
        """Forward drift f(x, t); zero for VE."""
        return jnp.zeros_like(x)

    def prior_std(self) -> Array:
        """Std of the prior p_1 used to initialize reverse-time sampling."""
        return self.marginal_prob_std(jnp.float32(1.0))

    def inverse_std(self, std: Array) -> Array:
        """t such that marginal_prob_std(t) == std (exact closed-form inverse).

        From sigma(t)^2 = (sigma^(2t) - 1) / (2 ln sigma):
        t = ln(1 + 2 ln(sigma) std^2) / (2 ln sigma).
        """
        std = jnp.asarray(std, dtype=jnp.float32)
        log_sigma = jnp.log(jnp.float32(self.sigma))
        return jnp.log1p(2.0 * log_sigma * std**2) / (2.0 * log_sigma)

    def inverse_hat_std(self, hat_std: Array) -> Array:
        """t such that std(t)/mean_coeff(t) == hat_std; VE mean coeff is 1."""
        return self.inverse_std(hat_std)


@dataclasses.dataclass(frozen=True)
class VPSDE:
    """Variance-Preserving SDE: dx = -1/2 beta(t) x dt + sqrt(beta(t)) dW.

    beta(t) = beta_min + t (beta_max - beta_min); marginals
    mean = exp(-1/2 int beta) x_0, std = sqrt(1 - exp(-int beta)).
    """

    beta_min: float = 0.1
    beta_max: float = 20.0
    std_eps: float = 1e-5

    def _log_mean_coeff(self, t: Array) -> Array:
        t = jnp.asarray(t, dtype=jnp.float32)
        return -0.25 * t**2 * (self.beta_max - self.beta_min) - 0.5 * t * self.beta_min

    def marginal_prob_std(self, t: Array) -> Array:
        std = jnp.sqrt(1.0 - jnp.exp(2.0 * self._log_mean_coeff(t)))
        return jnp.maximum(std, self.std_eps)

    def marginal_prob_mean_coeff(self, t: Array) -> Array:
        return jnp.exp(self._log_mean_coeff(t))

    def diffusion_coeff(self, t: Array) -> Array:
        t = jnp.asarray(t, dtype=jnp.float32)
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        return jnp.sqrt(beta_t)

    def drift(self, x: Array, t: Array) -> Array:
        """Forward drift f(x, t) = -1/2 beta(t) x."""
        t = jnp.asarray(t, dtype=jnp.float32)
        beta_t = self.beta_min + t * (self.beta_max - self.beta_min)
        return -0.5 * beta_t.reshape((-1,) + (1,) * (x.ndim - 1)) * x

    def prior_std(self) -> Array:
        return jnp.float32(1.0)

    def inverse_std(self, std: Array) -> Array:
        """t such that marginal_prob_std(t) == std (closed-form quadratic root).

        std^2 = 1 - exp(2 L(t)) with L(t) = -t^2 (bmax - bmin)/4 - t bmin/2, so
        (bmax - bmin)/2 t^2 + bmin t + ln(1 - std^2) = 0; the positive root is
        taken (std must lie in (0, prior_std))."""
        std = jnp.asarray(std, dtype=jnp.float32)
        a = 0.5 * (self.beta_max - self.beta_min)
        b = jnp.float32(self.beta_min)
        c = jnp.log1p(-jnp.clip(std**2, 0.0, 1.0 - 1e-7))
        return (-b + jnp.sqrt(b**2 - 4.0 * a * c)) / (2.0 * a)

    def inverse_hat_std(self, hat_std: Array) -> Array:
        """t such that std(t)/mean_coeff(t) == hat_std.

        hat_std^2 = exp(-2 L(t)) - 1 with L the log mean coefficient, so
        (bmax - bmin)/2 t^2 + bmin t - ln(1 + hat_std^2) = 0."""
        hat_std = jnp.asarray(hat_std, dtype=jnp.float32)
        a = 0.5 * (self.beta_max - self.beta_min)
        b = jnp.float32(self.beta_min)
        c = -jnp.log1p(hat_std**2)
        return (-b + jnp.sqrt(b**2 - 4.0 * a * c)) / (2.0 * a)


def edm_sigma_schedule(
    n_steps: int, sigma_min: float = 0.002, sigma_max: float = 80.0, rho: float = 7.0
) -> Array:
    """Karras et al. rho-schedule (reference sbgm/score_sampling.py:304-307)."""
    i = jnp.linspace(0.0, 1.0, n_steps)
    inv_rho = 1.0 / rho
    return (sigma_max**inv_rho + i * (sigma_min**inv_rho - sigma_max**inv_rho)) ** rho


def sdf_weights(
    sdf: Optional[Array],
    like: Array,
    max_land_weight: float = 1.0,
    min_sea_weight: float = 0.5,
) -> Array:
    """Loss weights from the normalized signed-distance field.

    w = sigmoid(sdf) * (max_land - min_sea) + min_sea; ones when no SDF is given
    (reference sbgm/score_unet.py:974-981).
    """
    if sdf is None:
        return jnp.ones_like(like)
    return jax.nn.sigmoid(sdf) * (max_land_weight - min_sea_weight) + min_sea_weight


def dsm_loss(
    score_fn: Callable[..., Array],
    x: Array,
    rng: Array,
    sde: VESDE | VPSDE = VESDE(),
    t_eps: float = 1e-3,
    sdf: Optional[Array] = None,
    max_land_weight: float = 1.0,
    min_sea_weight: float = 0.5,
    **cond,
) -> Array:
    """Denoising score-matching loss (reference sbgm/score_unet.py:936-985).

    Args:
      score_fn: callable ``score_fn(x_t, t, **cond) -> score`` (already closed over
        params); must accept NHWC inputs.
      x: clean HR target, NHWC.
      rng: PRNG key; split internally for t and z draws.
      sde: the forward SDE. The reference trains VE only; VP is supported with the
        standard perturbation x_t = m(t) x + sigma(t) z.
      t_eps: lowest sampled t (reference loss_fn t_eps=1e-3).
      sdf: optional normalized SDF, NHWC, broadcastable to x.
      cond: conditioning forwarded to ``score_fn`` (y, cond_img, lsm_cond, topo_cond).

    Returns the scalar loss.
    """
    t_rng, z_rng = jax.random.split(rng)
    b = x.shape[0]
    # U(t_eps, 1): same distribution as torch.rand * (1 - eps) + eps.
    t = jax.random.uniform(t_rng, (b,), dtype=jnp.float32, minval=t_eps, maxval=1.0)
    z = jax.random.normal(z_rng, x.shape, dtype=x.dtype)
    std = sde.marginal_prob_std(t)
    mean_coeff = sde.marginal_prob_mean_coeff(t)
    bshape = (b,) + (1,) * (x.ndim - 1)
    x_t = mean_coeff.reshape(bshape) * x + std.reshape(bshape) * z
    score = score_fn(x_t, t, **cond)
    w = sdf_weights(sdf, x, max_land_weight, min_sea_weight)
    sq = w * (score * std.reshape(bshape) + z) ** 2
    return jnp.mean(jnp.sum(sq, axis=tuple(range(1, x.ndim))))
