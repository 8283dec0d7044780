"""Sampler statistical tests on analytically known Gaussians + CFG protocol.

For data ~ N(mu, s0^2) under the VE SDE, the perturbed marginal at time t is
N(mu, s0^2 + sigma(t)^2) with exact score s(x, t) = -(x - mu) / (s0^2 + sigma(t)^2).
A correct reverse-SDE/ODE sampler driven by this exact score must reproduce
N(mu, s0^2 + sigma(eps)^2) ~= N(mu, s0^2).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.sampling import (
    SamplerConfig,
    apply_guidance,
    em_sampler,
    get_sampler,
    null_conditioning,
    ode_sampler,
    pc_sampler,
)
from sbgm_danra_tpu.sde import VESDE

SDE = VESDE()
MU, S0 = 1.5, 2.0
SHAPE = (256, 8, 8, 1)


def exact_score(x, t, **_):
    var = S0**2 + SDE.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
    return -(x - MU) / var


class TestEMSampler:
    def test_recovers_gaussian(self):
        cfg = SamplerConfig(num_steps=500)
        samples = np.asarray(
            jax.jit(lambda r: em_sampler(exact_score, r, SHAPE, SDE, cfg))(
                jax.random.PRNGKey(0)
            )
        )
        assert samples.shape == SHAPE
        assert samples.mean() == pytest.approx(MU, abs=0.15)
        assert samples.std() == pytest.approx(S0, rel=0.1)

    def test_single_step_runs(self):
        """num_steps=1 is a valid smoke value: one update at t=1, no crash
        (the grid spacing guards against the num_steps-1 division)."""
        for sampler in (em_sampler, pc_sampler):
            cfg = SamplerConfig(num_steps=1)
            out = sampler(exact_score, jax.random.PRNGKey(0), (2, 8, 8, 1), SDE, cfg)
            assert np.isfinite(np.asarray(out)).all()

    def test_deterministic_given_key(self):
        cfg = SamplerConfig(num_steps=20)
        a = em_sampler(exact_score, jax.random.PRNGKey(7), (4, 8, 8, 1), SDE, cfg)
        b = em_sampler(exact_score, jax.random.PRNGKey(7), (4, 8, 8, 1), SDE, cfg)
        c = em_sampler(exact_score, jax.random.PRNGKey(8), (4, 8, 8, 1), SDE, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert not np.allclose(np.asarray(a), np.asarray(c))


class TestPCSampler:
    def test_recovers_gaussian(self):
        cfg = SamplerConfig(num_steps=300)
        samples = np.asarray(
            jax.jit(lambda r: pc_sampler(exact_score, r, SHAPE, SDE, cfg))(
                jax.random.PRNGKey(1)
            )
        )
        assert samples.mean() == pytest.approx(MU, abs=0.15)
        assert samples.std() == pytest.approx(S0, rel=0.1)

    def test_two_nfe_per_step(self):
        calls = []

        def counting_score(x, t, **kw):
            calls.append(1)
            return exact_score(x, t)

        cfg = SamplerConfig(num_steps=5)
        # un-jitted so the python counter sees every evaluation
        pc_sampler(counting_score, jax.random.PRNGKey(0), (2, 4, 4, 1), SDE, cfg)
        # traced once per scan body: corrector + predictor = 2 trace-time calls
        assert len(calls) == 2


class TestODESampler:
    # The probability-flow ODE is a deterministic transport: starting from the
    # VE prior N(0, sigma(1)^2) rather than the true marginal
    # N(mu, s0^2 + sigma(1)^2), the exact Gaussian solution is
    #   x(eps) = mu + (s_eps / s_1) (x(1) - mu),  s_t = sqrt(s0^2 + sigma(t)^2),
    # so mean -> mu (1 - r), std -> r sigma(1), r = s_eps / s_1. Unlike the
    # stochastic samplers, the prior mismatch is not washed out by noise —
    # the test checks this closed form, which is far sharper than ~N(mu, s0).
    @staticmethod
    def _expected():
        s_eps = float(np.sqrt(S0**2 + float(SDE.marginal_prob_std(1e-3)) ** 2))
        s_1 = float(np.sqrt(S0**2 + float(SDE.marginal_prob_std(1.0)) ** 2))
        r = s_eps / s_1
        return MU * (1.0 - r), r * float(SDE.marginal_prob_std(1.0))

    @pytest.mark.parametrize("method,steps", [("rk4", 100), ("heun", 200)])
    def test_exact_gaussian_transport_fixed_step(self, method, steps):
        cfg = SamplerConfig(num_steps=steps, ode_method=method)
        samples = np.asarray(
            jax.jit(lambda r: ode_sampler(exact_score, r, SHAPE, SDE, cfg))(
                jax.random.PRNGKey(2)
            )
        )
        mean_exp, std_exp = self._expected()
        assert samples.mean() == pytest.approx(mean_exp, abs=0.05)
        assert samples.std() == pytest.approx(std_exp, rel=0.03)

    def test_rk45_adaptive(self):
        cfg = SamplerConfig(ode_method="rk45", rtol=1e-4, atol=1e-4)
        samples = np.asarray(
            ode_sampler(exact_score, jax.random.PRNGKey(3), SHAPE, SDE, cfg)
        )
        mean_exp, std_exp = self._expected()
        assert samples.mean() == pytest.approx(mean_exp, abs=0.08)
        assert samples.std() == pytest.approx(std_exp, rel=0.05)

    def test_deterministic_given_latent(self):
        cfg = SamplerConfig(num_steps=50, ode_method="rk4")
        z = jax.random.normal(jax.random.PRNGKey(9), (4, 8, 8, 1)) * SDE.prior_std()
        a = ode_sampler(exact_score, jax.random.PRNGKey(0), (4, 8, 8, 1), SDE, cfg, z=z)
        b = ode_sampler(exact_score, jax.random.PRNGKey(99), (4, 8, 8, 1), SDE, cfg, z=z)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_conditioning_reaches_ode_drift(self):
        # The reference ODE wrapper dropped conditioning (score_sampling.py:286);
        # ours must not.
        seen = {}

        def probe_score(x, t, y=None, **kw):
            seen["y"] = y
            return exact_score(x, t)

        cfg = SamplerConfig(num_steps=5, ode_method="rk4")
        ode_sampler(
            probe_score,
            jax.random.PRNGKey(0),
            (2, 4, 4, 1),
            SDE,
            cfg,
            cond={"y": jnp.array([1, 2])},
        )
        assert seen["y"] is not None

    def test_unknown_method_raises(self):
        with pytest.raises(ValueError):
            ode_sampler(
                exact_score,
                jax.random.PRNGKey(0),
                (1, 4, 4, 1),
                SDE,
                SamplerConfig(ode_method="bogus"),
            )


class TestGuidance:
    def _cond(self, b=2, s=8):
        k = jax.random.PRNGKey(0)
        return {
            "y": jnp.array([1, 2]),
            "cond_img": jax.random.normal(k, (b, s, s, 3)),
            "lsm_cond": jnp.ones((b, s, s, 2)),
            "topo_cond": jnp.ones((b, s, s, 2)),
        }

    def test_null_protocol(self):
        nc = null_conditioning(self._cond())
        np.testing.assert_array_equal(np.asarray(nc["y"]), 0)
        np.testing.assert_array_equal(np.asarray(nc["cond_img"]), 0.0)
        # value channel kept, mask channel zeroed
        np.testing.assert_array_equal(np.asarray(nc["lsm_cond"][..., 0]), 1.0)
        np.testing.assert_array_equal(np.asarray(nc["lsm_cond"][..., 1]), 0.0)
        np.testing.assert_array_equal(np.asarray(nc["topo_cond"][..., 1]), 0.0)

    def test_scale_zero_equals_conditional(self):
        def score(x, t, **cond):
            bonus = 0.0 if cond.get("y") is None else cond["y"].reshape(-1, 1, 1, 1)
            return exact_score(x, t) + bonus

        guided = apply_guidance(score, 0.0)
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 1))
        t = jnp.full((2,), 0.5)
        np.testing.assert_allclose(
            np.asarray(guided(x, t, **self._cond(s=4))),
            np.asarray(score(x, t, **self._cond(s=4))),
            rtol=2e-5, atol=1e-5,
        )

    def test_linear_combination(self):
        # score depends only on the label: cond branch sees y, null branch 0.
        def score(x, t, y=None, **kw):
            return jnp.broadcast_to(y.astype(jnp.float32).reshape(-1, 1, 1, 1), x.shape)

        guided = apply_guidance(score, 2.0)
        x = jnp.zeros((2, 4, 4, 1))
        t = jnp.full((2,), 0.5)
        out = guided(x, t, y=jnp.array([1, 3]), cond_img=None, lsm_cond=None, topo_cond=None)
        # (1+w)*y - w*0 = 3*y
        np.testing.assert_allclose(np.asarray(out[:, 0, 0, 0]), [3.0, 9.0])

    def test_none_scale_is_identity(self):
        f = lambda x, t: x
        assert apply_guidance(f, None) is f

    def test_max_scale_clamps(self):
        def score(x, t, y=None, **kw):
            return jnp.broadcast_to(y.astype(jnp.float32).reshape(-1, 1, 1, 1), x.shape)

        guided = apply_guidance(score, 10.0, max_scale=2.0)
        out = guided(
            jnp.zeros((1, 2, 2, 1)), jnp.full((1,), 0.5),
            y=jnp.array([1]), cond_img=None, lsm_cond=None, topo_cond=None,
        )
        np.testing.assert_allclose(np.asarray(out[0, 0, 0, 0]), 3.0)


class TestRegistry:
    def test_names(self):
        assert get_sampler("pc_sampler") is pc_sampler
        assert get_sampler("euler_maruyama") is em_sampler
        with pytest.raises(ValueError):
            get_sampler("nope")


class TestVPSampling:
    """VP-SDE reverse sampling with the exact Gaussian score.

    For data ~ N(mu, s0^2) under VP: marginal mean m(t) mu, variance
    m(t)^2 s0^2 + sigma(t)^2; exact score -(x - m mu) / (m^2 s0^2 + sigma^2).
    Sampling must recover ~N(mu, s0^2) (VP prior matches N(0,1) well at t=1).
    """

    MU, S0 = 0.8, 1.3

    @classmethod
    def _score(cls, sde):
        def score(x, t, **kw):
            m = sde.marginal_prob_mean_coeff(t).reshape(-1, 1, 1, 1)
            var = (m * cls.S0) ** 2 + sde.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - m * cls.MU) / var

        return score

    def test_em_recovers_gaussian(self):
        from sbgm_danra_tpu.sde import VPSDE

        sde = VPSDE()
        cfg = SamplerConfig(num_steps=500)
        s = np.asarray(
            jax.jit(lambda r: em_sampler(self._score(sde), r, SHAPE, sde, cfg))(
                jax.random.PRNGKey(0)
            )
        )
        assert s.mean() == pytest.approx(self.MU, abs=0.1)
        assert s.std() == pytest.approx(self.S0, rel=0.1)

    def test_ode_recovers_gaussian(self):
        from sbgm_danra_tpu.sde import VPSDE

        sde = VPSDE()
        cfg = SamplerConfig(num_steps=200, ode_method="rk4")
        s = np.asarray(
            jax.jit(lambda r: ode_sampler(self._score(sde), r, SHAPE, sde, cfg))(
                jax.random.PRNGKey(1)
            )
        )
        # VP prior N(0,1) is nearly exact at t=1, so the ODE transport lands
        # on the true distribution (unlike the VE case's prior mismatch)
        assert s.mean() == pytest.approx(self.MU, abs=0.1)
        assert s.std() == pytest.approx(self.S0, rel=0.1)


class TestEDMSampler:
    """EDM Heun over the Karras sigma grid (low-NFE path; reference ships only
    the schedule stub at score_sampling.py:304-307)."""

    def test_exact_gaussian_transport_ve(self):
        from sbgm_danra_tpu.sampling import edm_sampler

        cfg = SamplerConfig(num_steps=35)
        samples = np.asarray(
            jax.jit(lambda r: edm_sampler(exact_score, r, SHAPE, SDE, cfg))(
                jax.random.PRNGKey(3)
            )
        )
        assert samples.shape == SHAPE
        # deterministic transport: same closed form as TestODESampler, but at
        # 35 Karras nodes instead of 100+ uniform ones (the whole point of EDM)
        mean_exp, std_exp = TestODESampler._expected()
        assert samples.mean() == pytest.approx(mean_exp, abs=0.05)
        assert samples.std() == pytest.approx(std_exp, rel=0.03)

    def test_vp_transport(self):
        from sbgm_danra_tpu.sampling import edm_sampler
        from sbgm_danra_tpu.sde import VPSDE

        vp = VPSDE()

        def vp_score(x, t, **_):
            m = vp.marginal_prob_mean_coeff(t).reshape(-1, 1, 1, 1)
            var = (m * S0) ** 2 + vp.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - m * MU) / var

        cfg = SamplerConfig(num_steps=50)
        samples = np.asarray(
            jax.jit(lambda r: edm_sampler(vp_score, r, SHAPE, vp, cfg))(
                jax.random.PRNGKey(4)
            )
        )
        assert samples.mean() == pytest.approx(MU, abs=0.15)
        assert samples.std() == pytest.approx(S0, rel=0.1)

    def test_two_nfe_per_interval(self):
        from sbgm_danra_tpu.sampling import edm_sampler

        calls = []

        def counting_score(x, t, **kw):
            calls.append(1)
            return exact_score(x, t)

        edm_sampler(
            counting_score, jax.random.PRNGKey(0), (2, 4, 4, 1), SDE,
            SamplerConfig(num_steps=5),
        )
        # traced once per scan body: two Heun stages
        assert len(calls) == 2

    def test_churn_stochastic_but_reproducible(self):
        from sbgm_danra_tpu.sampling import edm_sampler

        cfg = SamplerConfig(num_steps=20, s_churn=10.0)
        shape = (64, 8, 8, 1)
        a = edm_sampler(exact_score, jax.random.PRNGKey(5), shape, SDE, cfg)
        b = edm_sampler(exact_score, jax.random.PRNGKey(5), shape, SDE, cfg)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # still transports correctly with churn on
        assert np.asarray(a).std() == pytest.approx(S0, rel=0.15)

    def test_churn_works_for_vp(self):
        from sbgm_danra_tpu.sampling import edm_sampler
        from sbgm_danra_tpu.sde import VPSDE

        vp = VPSDE()

        def vp_score(x, t, **_):
            m = vp.marginal_prob_mean_coeff(t).reshape(-1, 1, 1, 1)
            var = (m * S0) ** 2 + vp.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - m * MU) / var

        # churn is exact in hat space (unit mean coeff) for any SDE
        out = edm_sampler(
            vp_score, jax.random.PRNGKey(0), (64, 8, 8, 1), vp,
            SamplerConfig(num_steps=30, s_churn=5.0),
        )
        assert np.asarray(out).std() == pytest.approx(S0, rel=0.15)

    def test_registry(self):
        from sbgm_danra_tpu.sampling import edm_sampler, get_sampler

        assert get_sampler("edm_sampler") is edm_sampler
        assert get_sampler("edm") is edm_sampler


class TestDPMppSampler:
    """DPM-Solver++(2M) over the Karras grid: one NFE per interval — the
    lowest-NFE deterministic path (no reference counterpart)."""

    def test_exact_gaussian_transport_ve(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler

        cfg = SamplerConfig(num_steps=25)
        samples = np.asarray(
            jax.jit(lambda r: dpmpp_sampler(exact_score, r, SHAPE, SDE, cfg))(
                jax.random.PRNGKey(3)
            )
        )
        assert samples.shape == SHAPE
        # same deterministic closed-form transport as the ODE/EDM tests, at
        # 24 NFE (EDM-35 needs 68 for the same tolerance)
        mean_exp, std_exp = TestODESampler._expected()
        assert samples.mean() == pytest.approx(mean_exp, abs=0.05)
        assert samples.std() == pytest.approx(std_exp, rel=0.03)

    def test_vp_transport(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler
        from sbgm_danra_tpu.sde import VPSDE

        vp = VPSDE()

        def vp_score(x, t, **_):
            m = vp.marginal_prob_mean_coeff(t).reshape(-1, 1, 1, 1)
            var = (m * S0) ** 2 + vp.marginal_prob_std(t).reshape(-1, 1, 1, 1) ** 2
            return -(x - m * MU) / var

        cfg = SamplerConfig(num_steps=30)
        samples = np.asarray(
            jax.jit(lambda r: dpmpp_sampler(vp_score, r, SHAPE, vp, cfg))(
                jax.random.PRNGKey(4)
            )
        )
        assert samples.mean() == pytest.approx(MU, abs=0.15)
        assert samples.std() == pytest.approx(S0, rel=0.1)

    def test_one_nfe_per_interval(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler

        calls = []

        def counting_score(x, t, **kw):
            calls.append(1)
            return exact_score(x, t)

        dpmpp_sampler(
            counting_score, jax.random.PRNGKey(0), (2, 4, 4, 1), SDE,
            SamplerConfig(num_steps=5),
        )
        # Trace-count PROXY (same caveat as TestPCSampler): 2 python-level
        # calls = first interval eager + scan body traced ONCE. This pins the
        # program structure (a single scan over intervals with one score call
        # in the body), not the executed NFE; the compiled program evaluates
        # the score num_steps - 1 times total (one per interval — the scan
        # runs its once-traced body num_steps - 2 times — vs edm_sampler's
        # two Heun stages per interval). Executed-NFE parity is covered
        # indirectly by test_matches_edm_at_high_node_count, which would fail
        # if intervals were skipped or doubled.
        assert len(calls) == 2

    def test_matches_edm_at_high_node_count(self):
        """Both solve the same probability-flow ODE: on a dense grid with the
        exact score they must agree sample-for-sample (same latent)."""
        from sbgm_danra_tpu.sampling import dpmpp_sampler, edm_sampler

        z = jax.random.normal(jax.random.PRNGKey(11), (8, 8, 8, 1)) * SDE.prior_std()
        cfg = SamplerConfig(num_steps=128)
        a = dpmpp_sampler(exact_score, jax.random.PRNGKey(0), (8, 8, 8, 1), SDE, cfg, z=z)
        b = edm_sampler(exact_score, jax.random.PRNGKey(1), (8, 8, 8, 1), SDE, cfg, z=z)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=0.0, atol=5e-3)

    def test_deterministic_given_latent(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler

        z = jax.random.normal(jax.random.PRNGKey(9), (4, 8, 8, 1)) * SDE.prior_std()
        cfg = SamplerConfig(num_steps=12)
        a = dpmpp_sampler(exact_score, jax.random.PRNGKey(0), (4, 8, 8, 1), SDE, cfg, z=z)
        b = dpmpp_sampler(exact_score, jax.random.PRNGKey(5), (4, 8, 8, 1), SDE, cfg, z=z)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tiny_step_counts_run(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler

        for n in (1, 2, 3):
            out = dpmpp_sampler(
                exact_score, jax.random.PRNGKey(0), (2, 4, 4, 1), SDE,
                SamplerConfig(num_steps=n),
            )
            assert out.shape == (2, 4, 4, 1)
            assert np.isfinite(np.asarray(out)).all()

    def test_registry(self):
        from sbgm_danra_tpu.sampling import dpmpp_sampler, get_sampler

        assert get_sampler("dpmpp_sampler") is dpmpp_sampler
        assert get_sampler("dpmpp_2m") is dpmpp_sampler


class TestInverseStd:
    @pytest.mark.parametrize("sde_cls", ["ve", "vp"])
    def test_round_trip(self, sde_cls):
        from sbgm_danra_tpu.sde import VESDE, VPSDE

        sde = VESDE() if sde_cls == "ve" else VPSDE()
        t = jnp.linspace(1e-3, 1.0, 64)
        std = sde.marginal_prob_std(t)
        t_back = sde.inverse_std(std)
        np.testing.assert_allclose(np.asarray(t_back), np.asarray(t), rtol=2e-4, atol=2e-5)


class TestRK45Convergence:
    def test_flag_set_on_pathological_drift(self):
        """A stiff drift that burns the iteration cap must report
        converged=False instead of returning an unconverged sample silently."""
        from sbgm_danra_tpu.sampling.samplers import _rk45_adaptive

        # error estimate never satisfies the controller: reject forever
        stiff = lambda x, t: 1e12 * jnp.sin(1e9 * t) * (1.0 + x)
        x0 = jnp.ones((2, 4, 4, 1))
        x, converged = jax.jit(
            lambda x0: _rk45_adaptive(stiff, x0, 1.0, 1e-3, 1e-10, 1e-12)
        )(x0)
        assert not bool(converged)

    def test_flag_true_on_smooth_drift(self):
        from sbgm_danra_tpu.sampling.samplers import _rk45_adaptive

        smooth = lambda x, t: -x
        x0 = jnp.ones((2, 4, 4, 1))
        x, converged = jax.jit(
            lambda x0: _rk45_adaptive(smooth, x0, 1.0, 1e-3, 1e-5, 1e-6)
        )(x0)
        assert bool(converged)
        # integrating dx/dt = -x DOWNWARD from t0=1 to t1=1e-3: x(t1) = e^{t0-t1}
        np.testing.assert_allclose(
            np.asarray(x), np.exp(1.0 - 1e-3) * np.ones_like(x0), rtol=1e-3
        )


class TestQualityStudy:
    """Exact-score sampler quality machinery (scripts/edm_quality_study.py)."""

    def test_regime_scores_and_truth(self):
        from sbgm_danra_tpu.evaluate.quality_study import (
            bimodal_regime, correlated_regime, gaussian_regime,
        )

        for regime in (gaussian_regime(), bimodal_regime(), correlated_regime(size=8)):
            x = jax.random.normal(jax.random.PRNGKey(0), (4, 8, 8, 1))
            t = jnp.full((4,), 0.5)
            s = regime.score_fn(x, t)
            assert s.shape == x.shape and np.isfinite(np.asarray(s)).all()
            draws = np.asarray(regime.sample_truth(jax.random.PRNGKey(1), (2048, 8, 8, 1)))
            assert draws.mean() == pytest.approx(regime.mean, abs=0.15)
            assert draws.std() == pytest.approx(regime.std, rel=0.1)

    def test_edm_matches_pc_on_unimodal(self):
        """The decision invariant for the fast path: EDM-35's CRPS within 5%
        of PC's on the exact-score unimodal regime (BASELINE.md table)."""
        from sbgm_danra_tpu.evaluate.quality_study import gaussian_regime, run_study

        grid = (
            {"label": "pc", "sampler": "pc_sampler", "num_steps": 200, "nfe": 400},
            {"label": "edm", "sampler": "edm_sampler", "num_steps": 35, "nfe": 68},
        )
        res = run_study(n_members=32, size=8, n_truths=32, seed=0,
                        sampler_grid=grid, regimes=(gaussian_regime(),))
        row = res["unimodal"]
        assert row["edm"]["crps"] == pytest.approx(row["pc"]["crps"], rel=0.05)
        assert row["edm"]["std_ratio"] == pytest.approx(1.0, abs=0.1)
