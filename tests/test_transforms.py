"""Transform semantics + exact round-trips (reference sbgm/special_transforms.py).

Bit-consistent back-transforms are a stated BASELINE.md requirement; the tests
here pin both the round-trip identity and the reference's quirkier conventions
(buffer_frac expansion asymmetry, observed-range log clamping).
"""

import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu import transforms as T


@pytest.fixture()
def x():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.uniform(0.1, 50.0, size=(4, 16, 16)).astype(np.float32))


class TestZScore:
    def test_forward(self, x):
        t = T.ZScore(mean=10.0, std=5.0)
        np.testing.assert_allclose(t(x), (np.asarray(x) - 10.0) / (5.0 + 1e-8), rtol=1e-6)

    def test_roundtrip(self, x):
        t = T.ZScore(mean=10.0, std=5.0)
        np.testing.assert_allclose(t.inverse()(t(x)), x, rtol=1e-5, atol=1e-5)

    def test_inverse_matches_reference_eps_convention(self):
        # back transform multiplies by (std + 1e-8), not std.
        t = T.ZScoreBack(mean=0.0, std=1.0)
        val = float(t(jnp.float32(1e8)))
        assert val == pytest.approx(1e8 * (1.0 + 1e-8))


class TestLinearScale:
    def test_forward_01(self, x):
        t = T.LinearScale(0.0, 1.0, data_min=0.1, data_max=50.0)
        out = np.asarray(t(x))
        assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6

    def test_roundtrip_minus1_1(self, x):
        t = T.LinearScale(-1.0, 1.0, data_min=0.0, data_max=60.0)
        np.testing.assert_allclose(t.inverse()(t(x)), x, rtol=1e-5, atol=1e-4)


class TestLogTransforms:
    STATS = {"log_mean": -3.9685, "log_std": 6.5996, "log_min": -18.0, "log_max": 6.0}

    @pytest.mark.parametrize("scale_type", ["log", "log_01", "log_minus1_1", "log_zscore"])
    def test_exact_inverse_roundtrip(self, x, scale_type):
        fwd = T.LogTransform(
            scale_type=scale_type,
            log_mean=self.STATS["log_mean"],
            log_std=self.STATS["log_std"],
            log_min=self.STATS["log_min"],
            log_max=self.STATS["log_max"],
            buffer_frac=0.2,
        )
        # fwd.inverse() undoes log(x+eps) scaling back to x+eps.
        recovered = fwd.inverse()(fwd(x)) - fwd.eps
        np.testing.assert_allclose(recovered, x, rtol=1e-4, atol=1e-4)

    def test_forward_buffer_expansion_full_frac(self):
        # forward expands the log range by buffer_frac * range on EACH side
        # (reference :265-269).
        fwd = T.LogTransform(
            scale_type="log_01", log_min=0.0, log_max=10.0, buffer_frac=0.5,
            log_mean=0.0, log_std=1.0,
        )
        # expanded range = [-5, 15]; log(x+eps)=0 maps to (0-(-5))/20 = 0.25
        val = float(fwd(jnp.float32(1.0 - 0.01)))
        assert val == pytest.approx(0.25, rel=1e-5)

    def test_back_buffer_expansion_half_frac(self):
        # back transform expands by buffer_frac/2 per side (reference :393-399).
        back = T.LogBackTransform(
            scale_type="log_01", log_min=0.0, log_max=10.0, buffer_frac=0.5,
        )
        # expanded back-range = [-2.5, 12.5]; input 0.2 -> log = 0.2*15 - 2.5 = 0.5
        val = float(back(jnp.float32(0.2)))
        assert val == pytest.approx(np.exp(0.5), rel=1e-5)

    def test_back_clamps_to_observed_log_range(self):
        back = T.LogBackTransform(
            scale_type="log_zscore",
            log_mean=0.0,
            log_std=1.0,
            clamp_log_min=-2.0,
            clamp_log_max=2.0,
        )
        assert float(back(jnp.float32(100.0))) == pytest.approx(np.exp(2.0), rel=1e-6)
        assert float(back(jnp.float32(-100.0))) == pytest.approx(np.exp(-2.0), rel=1e-6)

    def test_log_zscore_matches_manual(self, x):
        fwd = T.LogTransform(scale_type="log_zscore", log_mean=-3.9685, log_std=6.5996)
        expected = (np.log(np.asarray(x) + 0.01) - (-3.9685)) / (6.5996 + 1e-8)
        np.testing.assert_allclose(fwd(x), expected, rtol=1e-5)


class TestStatsFactories:
    STATS = {
        "mean": 8.9147, "std": 6.0034, "min": 0.0, "max": 80.0,
        "log_mean": -2.7854, "log_std": 5.3563, "log_min": -19.0, "log_max": 5.0,
    }

    @pytest.mark.parametrize(
        "ttype", ["zscore", "scale01", "scale_minus1_1", "log_zscore", "log_01"]
    )
    def test_forward_back_consistency(self, x, ttype):
        # Range-dependent log scalings only invert with buffer_frac=0 — the
        # reference expands the forward range by buffer_frac but the backward
        # range by buffer_frac/2 (special_transforms.py:265-269 vs :393-399),
        # which is not self-inverse by construction. buffer_frac=0 isolates the
        # core map; the asymmetry itself is pinned by the dedicated tests above.
        bf = 0.0 if ttype in ("log_01", "log_minus1_1") else 0.2
        fwd = T.transform_from_stats(ttype, self.STATS, buffer_frac=bf)
        back = T.back_transform_from_stats(ttype, self.STATS, buffer_frac=bf)
        y = np.asarray(back(fwd(x)))
        if ttype.startswith("log"):
            # back returns x + eps (forward adds eps inside the log, the
            # reference back-transform never subtracts it).
            np.testing.assert_allclose(y, np.asarray(x) + 0.01, rtol=1e-4, atol=1e-4)
        else:
            np.testing.assert_allclose(y, x, rtol=1e-5, atol=1e-4)

    def test_back_transform_log_clamps_to_observed(self):
        back = T.back_transform_from_stats("log_zscore", self.STATS, buffer_frac=0.2)
        huge = float(back(jnp.float32(1e6)))
        assert huge == pytest.approx(np.exp(self.STATS["log_max"]), rel=1e-5)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            T.transform_from_stats("bogus", self.STATS)


class TestStatsIO:
    def test_path_convention(self):
        p = T.stats_path("/root/stats", "DANRA", "prcp", "589x789", "170_350_340_520", "all")
        assert p == (
            "/root/stats/DANRA/prcp/all/"
            "global_stats__DANRA__589x789__crop__170_350_340_520__prcp__all.json"
        )

    def test_load_and_build_back_transforms(self, tmp_path):
        stats = TestStatsFactories.STATS
        for model, var in [("DANRA", "prcp"), ("ERA5", "temp"), ("ERA5", "prcp")]:
            p = T.stats_path(str(tmp_path), model, var, "589x789", "full", "all")
            os.makedirs(os.path.dirname(p), exist_ok=True)
            with open(p, "w") as f:
                json.dump(stats, f)
        bt = T.build_back_transforms_from_stats(
            hr_var="prcp", hr_model="DANRA", domain_str_hr="589x789",
            crop_region_str_hr="full", hr_scaling_method="log_zscore",
            hr_buffer_frac=0.2, lr_vars=["temp", "prcp"], lr_model="ERA5",
            domain_str_lr="589x789", crop_region_str_lr="full",
            lr_scaling_methods=["zscore", "log_zscore"], lr_buffer_frac=0.2,
            split="all", stats_dir_root=str(tmp_path),
        )
        assert set(bt) == {"prcp_hr", "generated", "temp_lr", "prcp_lr"}
        assert bt["generated"] is bt["prcp_hr"]
        assert isinstance(bt["temp_lr"], T.ZScoreBack)

    def test_inline_params_all_documented_methods(self):
        """build_back_transforms (inline legacy params) accepts every method
        the module documents: zscore, 01, scale_minus1_1, log_*, none."""
        params = {"glob_mean": 2.0, "glob_std": 3.0, "glob_min": -5.0,
                  "glob_max": 5.0}
        for method, probe in [
            ("zscore", 0.5), ("01", 0.5), ("scale_minus1_1", 0.0), ("none", 1.5),
        ]:
            bt = T.build_back_transforms(
                hr_var="temp", hr_scaling_method=method,
                hr_scaling_params=params, lr_vars=[], lr_scaling_methods=[],
                lr_scaling_params=[],
            )
            out = bt["generated"](np.float32(probe))
            assert np.isfinite(out)
        # scale_minus1_1 inverse maps [-1, 1] back to [min, max]
        bt = T.build_back_transforms(
            hr_var="temp", hr_scaling_method="scale_minus1_1",
            hr_scaling_params=params, lr_vars=[], lr_scaling_methods=[],
            lr_scaling_params=[],
        )
        np.testing.assert_allclose(bt["generated"](np.float32(-1.0)), -5.0)
        np.testing.assert_allclose(bt["generated"](np.float32(1.0)), 5.0)

    def test_missing_stats_raise(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            T.build_back_transforms_from_stats(
                hr_var="prcp", hr_model="DANRA", domain_str_hr="589x789",
                crop_region_str_hr="full", hr_scaling_method="zscore",
                hr_buffer_frac=0.2, lr_vars=[], lr_model="ERA5",
                domain_str_lr="589x789", crop_region_str_lr="full",
                lr_scaling_methods=[], lr_buffer_frac=0.2,
                split="all", stats_dir_root=str(tmp_path),
            )


class TestCompose:
    def test_compose_inverse_order(self, x):
        c = T.Compose((T.ZScore(2.0, 3.0), T.LinearScale(0.0, 1.0, -5.0, 5.0)))
        np.testing.assert_allclose(c.inverse()(c(x)), x, rtol=1e-5, atol=1e-4)


class TestBackendDispatch:
    """Host arrays must stay on the host (the windowed-stager starvation fix):
    a numpy input through any transform must come back as numpy WITHOUT
    dispatching a device computation, while jax inputs / tracers keep the jnp
    path (jittability is part of the transform contract)."""

    CASES = (
        T.ZScore(10.0, 5.0),
        T.LinearScale(0.0, 1.0, -5.0, 5.0),
        T.LogTransform(scale_type="log_zscore", log_mean=1.0, log_std=0.5,
                       log_min=0.0, log_max=4.0),
        T.LogBackTransform(scale_type="log_zscore", log_mean=1.0, log_std=0.5,
                           log_min=0.0, log_max=4.0,
                           clamp_log_min=0.0, clamp_log_max=4.0),
    )

    @pytest.mark.parametrize("t", CASES, ids=lambda t: type(t).__name__)
    def test_numpy_in_numpy_out(self, t):
        xh = np.random.default_rng(3).uniform(0.1, 5.0, (8, 8)).astype(np.float32)
        out = t(xh)
        assert isinstance(out, np.ndarray) and not isinstance(out, jnp.ndarray)
        assert np.isfinite(out).all()

    @pytest.mark.parametrize("t", CASES, ids=lambda t: type(t).__name__)
    def test_jit_path_matches_host(self, t):
        import jax

        xh = np.random.default_rng(4).uniform(0.1, 5.0, (8, 8)).astype(np.float32)
        host = t(xh)
        dev = jax.jit(t)(jnp.asarray(xh))
        assert isinstance(dev, jnp.ndarray)
        np.testing.assert_allclose(np.asarray(dev), host, rtol=1e-6, atol=1e-6)
