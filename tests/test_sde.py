"""SDE math: closed forms, limits, and DSM loss identities.

Mirrors the reference semantics at sbgm/score_unet.py:881-985.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.sde import VESDE, VPSDE, dsm_loss, edm_sigma_schedule, sdf_weights


class TestVESDE:
    def test_marginal_std_closed_form(self):
        sde = VESDE(sigma=25.0)
        t = jnp.linspace(0.001, 1.0, 64)
        expected = np.sqrt((25.0 ** (2 * np.asarray(t)) - 1.0) / (2.0 * np.log(25.0)))
        np.testing.assert_allclose(sde.marginal_prob_std(t), expected, rtol=1e-4)

    def test_marginal_std_floor(self):
        sde = VESDE(sigma=25.0)
        assert float(sde.marginal_prob_std(jnp.float32(0.0))) == pytest.approx(1e-5)

    def test_diffusion_coeff(self):
        sde = VESDE(sigma=25.0)
        t = jnp.array([0.0, 0.5, 1.0])
        np.testing.assert_allclose(
            sde.diffusion_coeff(t), [1.0, 5.0, 25.0], rtol=1e-6
        )

    def test_g_squared_equals_dvar_dt(self):
        # VE consistency: d/dt Var(t) = g(t)^2.
        sde = VESDE(sigma=25.0)
        t = jnp.linspace(0.1, 0.9, 9)
        var = lambda s: sde.marginal_prob_std(s) ** 2
        dvar = jax.vmap(jax.grad(lambda s: var(s)[()]))(t)
        np.testing.assert_allclose(dvar, sde.diffusion_coeff(t) ** 2, rtol=1e-3)

    def test_prior_std(self):
        sde = VESDE(sigma=25.0)
        assert float(sde.prior_std()) == pytest.approx(
            float(sde.marginal_prob_std(jnp.float32(1.0)))
        )


class TestVPSDE:
    def test_limits(self):
        sde = VPSDE()
        assert float(sde.marginal_prob_std(jnp.float32(0.0))) == pytest.approx(1e-5)
        assert float(sde.marginal_prob_std(jnp.float32(1.0))) == pytest.approx(1.0, abs=1e-3)
        assert float(sde.marginal_prob_mean_coeff(jnp.float32(0.0))) == pytest.approx(1.0)

    def test_variance_preserved(self):
        sde = VPSDE()
        t = jnp.linspace(0.0, 1.0, 11)
        total = sde.marginal_prob_mean_coeff(t) ** 2 + sde.marginal_prob_std(t) ** 2
        assert np.all(np.asarray(total) <= 1.0 + 1e-5)


def test_edm_schedule_monotone_decreasing():
    s = np.asarray(edm_sigma_schedule(32))
    assert s[0] == pytest.approx(80.0)
    assert s[-1] == pytest.approx(0.002, rel=1e-3)
    assert np.all(np.diff(s) < 0)


class TestSDFWeights:
    def test_no_sdf_gives_ones(self):
        like = jnp.zeros((2, 4, 4, 1))
        np.testing.assert_array_equal(sdf_weights(None, like), np.ones((2, 4, 4, 1)))

    def test_range(self):
        sdf = jnp.linspace(-10, 10, 21).reshape(1, 21, 1, 1)
        w = np.asarray(sdf_weights(sdf, sdf))
        assert w.min() >= 0.5 and w.max() <= 1.0
        # sigmoid(0) = 0.5 -> weight 0.75 at the coastline.
        mid = float(
            np.asarray(
                sdf_weights(jnp.zeros((1, 1, 1, 1)), jnp.zeros((1, 1, 1, 1)))
            ).item()
        )
        assert mid == pytest.approx(0.75)


class TestDSMLoss:
    def test_zero_score_expected_loss(self, rng):
        # With score == 0 the loss is E||z||^2 = number of pixels.
        x = jnp.zeros((8, 16, 16, 1))
        score_fn = lambda x_t, t: jnp.zeros_like(x_t)
        losses = [
            float(dsm_loss(score_fn, x, jax.random.PRNGKey(i))) for i in range(20)
        ]
        assert np.mean(losses) == pytest.approx(16 * 16, rel=0.1)

    def test_perfect_score_zero_loss(self, rng):
        # If the model returns the exact score -z/sigma, the loss is 0.
        sde = VESDE()

        def make_loss(key):
            x = jnp.zeros((4, 8, 8, 1))
            t_rng, z_rng = jax.random.split(key)
            # replicate the internal draws: score_fn sees x_t = sigma z, so
            # score = -x_t / sigma^2 = -z/sigma exactly cancels.
            score_fn = lambda x_t, t: -x_t / sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return float(dsm_loss(score_fn, x, key, sde=sde))

        assert make_loss(jax.random.PRNGKey(3)) == pytest.approx(0.0, abs=1e-6)

    def test_sdf_weighting_scales_loss(self, rng):
        x = jnp.zeros((4, 8, 8, 1))
        score_fn = lambda x_t, t: jnp.zeros_like(x_t)
        # Large negative SDF -> all-sea weights -> 0.5x the unweighted loss.
        sdf = -100.0 * jnp.ones_like(x)
        l_sea = float(dsm_loss(score_fn, x, rng, sdf=sdf))
        l_plain = float(dsm_loss(score_fn, x, rng))
        assert l_sea == pytest.approx(0.5 * l_plain, rel=1e-5)

    def test_conditioning_kwargs_forwarded(self, rng):
        x = jnp.zeros((2, 8, 8, 1))
        seen = {}

        def score_fn(x_t, t, y=None, cond_img=None):
            seen["y"] = y
            seen["cond_img"] = cond_img
            return jnp.zeros_like(x_t)

        y = jnp.array([1, 2])
        cond = jnp.ones((2, 8, 8, 3))
        dsm_loss(score_fn, x, rng, y=y, cond_img=cond)
        assert seen["y"] is y and seen["cond_img"] is cond

    def test_vp_perturbation_uses_mean_coeff(self, rng):
        sde = VPSDE()
        x = 5.0 * jnp.ones((4, 8, 8, 1))
        captured = {}

        def score_fn(x_t, t, **kw):
            captured["x_t"] = x_t
            captured["t"] = t
            return jnp.zeros_like(x_t)

        dsm_loss(score_fn, x, rng, sde=sde)
        t = captured["t"]
        m = np.asarray(sde.marginal_prob_mean_coeff(t)).reshape(-1, 1, 1, 1)
        std = np.asarray(sde.marginal_prob_std(t)).reshape(-1, 1, 1, 1)
        z_implied = (np.asarray(captured["x_t"]) - m * 5.0) / std
        # implied z should be standard normal-ish, not biased by the mean shrink
        assert abs(z_implied.mean()) < 0.2


class TestAuxLosses:
    """Reference utils.py:130-188 loss modules (off-main-path there too)."""

    def test_simple_loss(self):
        import jax.numpy as jnp

        from sbgm_danra_tpu.losses import simple_loss

        a = jnp.ones((2, 4, 4, 1))
        b = jnp.zeros((2, 4, 4, 1))
        assert float(simple_loss(a, b)) == pytest.approx(1.0)

    def test_hybrid_loss_matches_reference_rule(self):
        import jax.numpy as jnp

        from sbgm_danra_tpu.losses import hybrid_loss, simple_loss

        rng = np.random.default_rng(0)
        preds = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
        targs = jnp.asarray(rng.normal(size=(4, 3, 3)).astype(np.float32))
        expected = float(simple_loss(preds[-1], targs[0]))
        for t in range(1, 4):
            expected += 0.5 * float(simple_loss(preds[t - 1], targs[t]))
        assert float(hybrid_loss(preds, targs)) == pytest.approx(expected, rel=1e-6)

    def test_sdf_weighted_mse_bounds(self):
        import jax.numpy as jnp

        from sbgm_danra_tpu.losses import sdf_weighted_mse

        err = jnp.ones((2, 4, 4, 1))
        zero = jnp.zeros_like(err)
        deep_sea = sdf_weighted_mse(err, zero, jnp.full_like(err, -50.0))
        deep_land = sdf_weighted_mse(err, zero, jnp.full_like(err, 50.0))
        assert float(deep_sea) == pytest.approx(0.5, abs=1e-5)
        assert float(deep_land) == pytest.approx(1.0, abs=1e-5)
