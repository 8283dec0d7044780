"""Generation artifacts, evaluation metrics, CRPS, and pipelines (splits/stats)."""

import json
import os

import numpy as np
import pytest

from sbgm_danra_tpu.evaluate.crps import crps_ensemble, crps_mean


class TestCRPS:
    def test_matches_bruteforce(self):
        rng = np.random.default_rng(0)
        members = rng.normal(size=(9, 5, 5))
        obs = rng.normal(size=(5, 5))
        got = crps_ensemble(members, obs, fair=False)
        m = members.shape[0]
        mae = np.abs(members - obs).mean(axis=0)
        spread = np.abs(members[:, None] - members[None, :]).mean(axis=(0, 1))
        expected = mae - 0.5 * spread
        np.testing.assert_allclose(got, expected, rtol=1e-10)

    def test_fair_variant(self):
        rng = np.random.default_rng(1)
        members = rng.normal(size=(7, 4))
        obs = rng.normal(size=(4,))
        got = crps_ensemble(members, obs, fair=True)
        m = members.shape[0]
        mae = np.abs(members - obs).mean(axis=0)
        spread = np.abs(members[:, None] - members[None, :]).sum(axis=(0, 1)) / (
            m * (m - 1)
        )
        np.testing.assert_allclose(got, mae - 0.5 * spread, rtol=1e-10)

    def test_perfect_deterministic_forecast(self):
        obs = np.ones((3, 3))
        members = np.ones((5, 3, 3))
        assert crps_mean(members, obs) == pytest.approx(0.0)

    def test_sharp_beats_flat(self):
        rng = np.random.default_rng(2)
        obs = np.zeros((64,))
        sharp = rng.normal(0, 0.1, size=(50, 64))
        flat = rng.normal(0, 2.0, size=(50, 64))
        assert crps_mean(sharp, obs) < crps_mean(flat, obs)


class TestSplitsPipeline:
    def test_time_and_random_split(self, tmp_path):
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.data import zarrlite
        from sbgm_danra_tpu.data.paths import build_data_path
        from sbgm_danra_tpu.pipelines.splits import (
            SplitSpec, assign_splits, create_data_splits,
        )

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(24, 32), n_days=30,
                               start_date="19991215"))
        written = create_data_splits(
            root,
            {"DANRA": ["temp"], "ERA5": ["temp"]},
            (24, 32),
            SplitSpec(method="Time", year_ranges={"train": (1999, 1999), "valid": (2000, 2000)}),
        )
        # Dec 15-31 1999 = 17 days in train; rest in valid
        assert written["DANRA/temp/train"] == 17
        assert written["DANRA/temp/valid"] == 13
        g = zarrlite.open_group(build_data_path(root, "DANRA", "temp", (24, 32), "train"))
        assert len(g.keys()) == 17

        splits = assign_splits([f"2000010{i}" for i in range(1, 10)],
                               SplitSpec(method="Random", fractions={"a": 0.5, "b": 0.5}))
        assert len(splits["a"]) + len(splits["b"]) == 9

    def test_unknown_method(self):
        from sbgm_danra_tpu.pipelines.splits import SplitSpec, assign_splits

        with pytest.raises(ValueError):
            assign_splits(["20000101"], SplitSpec(method="bogus"))


class TestStatsPipeline:
    def test_streaming_matches_direct(self, tmp_path):
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.data.paths import build_data_path
        from sbgm_danra_tpu.data import zarrlite
        from sbgm_danra_tpu.pipelines.stats_pipeline import compute_global_stats
        from sbgm_danra_tpu.utils.units import correct_variable_units

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(24, 32), n_days=10))
        store = build_data_path(root, "DANRA", "temp", (24, 32), "all")
        stats = compute_global_stats(store, "temp", "DANRA", num_workers=2)

        g = zarrlite.open_group(store)
        fields = np.stack(
            [correct_variable_units("temp", "DANRA", g[k]["data"][...]) for k in g.keys()]
        ).astype(np.float64)
        assert stats["mean"] == pytest.approx(fields.mean(), rel=1e-9)
        assert stats["std"] == pytest.approx(fields.std(), rel=1e-6)
        assert stats["min"] == pytest.approx(fields.min())
        assert stats["max"] == pytest.approx(fields.max())
        logf = np.log(np.maximum(fields, 0) + 0.01)
        assert stats["log_mean"] == pytest.approx(logf.mean(), rel=1e-9)

    def test_crop_region(self, tmp_path):
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.data.paths import build_data_path
        from sbgm_danra_tpu.pipelines.stats_pipeline import compute_global_stats

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(24, 32), n_days=4))
        store = build_data_path(root, "DANRA", "temp", (24, 32), "all")
        full = compute_global_stats(store, "temp", "DANRA")
        crop = compute_global_stats(store, "temp", "DANRA", crop_region=(4, 12, 8, 16))
        assert crop["n"] == 4 * 8 * 8
        assert crop["n"] < full["n"]


class TestEvaluationArtifacts:
    @pytest.fixture()
    def artifacts(self, tmp_path):
        """Hand-written artifacts in the SampleGenerator layout."""
        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.utils.naming import get_model_string

        cfg = from_dict(
            {
                "paths": {"sample_dir": str(tmp_path)},
                "highres": {"variable": "prcp"},
                "lowres": {"condition_variables": ["temp"], "scaling_methods": ["zscore"]},
                "evaluation": {"n_repeats": 6},
            }
        )
        rng = np.random.default_rng(0)
        sample_path = os.path.join(
            str(tmp_path), "generation", get_model_string(cfg), "generated_samples"
        )
        os.makedirs(sample_path, exist_ok=True)
        truth = rng.normal(size=(1, 16, 16))
        members = truth + rng.normal(0, 0.3, size=(6, 16, 16))
        np.savez_compressed(os.path.join(sample_path, "gen_samples_repeated_6.npz"), members)
        np.savez_compressed(os.path.join(sample_path, "eval_samples_repeated_6.npz"), truth)
        np.savez_compressed(
            os.path.join(sample_path, "seasons_repeated_6.npz"), np.array([2])
        )
        return cfg

    def test_evaluation_loads_and_scores(self, artifacts):
        from sbgm_danra_tpu.evaluate.evaluation import Evaluation

        ev = Evaluation(artifacts, generated_sample_type="repeated", n_samples=6)
        px = ev.full_pixel_statistics(save_stats=False)
        assert px["rmse_per_sample"].shape == (6,)
        sp = ev.spatial_statistics(save_stats=False)
        assert sp["rmse_map"].shape == (16, 16)
        scores = ev.ensemble_crps()
        assert 0 < scores["crps"] < 1.0
        assert scores["spread"] > 0

    def test_missing_artifact_raises(self, artifacts):
        from sbgm_danra_tpu.evaluate.evaluation import Evaluation

        with pytest.raises(FileNotFoundError):
            Evaluation(artifacts, generated_sample_type="multiple", n_samples=4)

    def test_plot_examples(self, artifacts):
        from sbgm_danra_tpu.evaluate.evaluation import Evaluation

        ev = Evaluation(artifacts, generated_sample_type="repeated", n_samples=6)
        path = ev.plot_example_images(n_samples=2)
        assert os.path.exists(path)


class TestPlotting:
    def test_plot_sample_variants(self, tmp_path):
        from sbgm_danra_tpu.utils.plotting import plot_sample, plot_sample_with_boxplot

        rng = np.random.default_rng(0)
        field = rng.normal(10, 3, size=(16, 16))
        lsm = (rng.random((16, 16)) > 0.4).astype(float)
        p1 = str(tmp_path / "s.png")
        plot_sample(field, "temp", lsm=lsm, mask_ocean=True, path=p1)
        p2 = str(tmp_path / "b.png")
        plot_sample_with_boxplot(field, "prcp", lsm=lsm, mask_ocean=True, path=p2)
        assert os.path.exists(p1) and os.path.exists(p2)

    def test_plot_losses(self, tmp_path):
        from sbgm_danra_tpu.utils.plotting import plot_losses

        p = str(tmp_path / "l.png")
        plot_losses({"train_loss": [3, 2, 1], "val_loss": [4, 3, 2]}, p)
        assert os.path.exists(p)


class TestSpectrumEvaluation:
    def test_power_spectrum_comparison(self, tmp_path):
        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.evaluate.evaluation import Evaluation
        from sbgm_danra_tpu.utils.naming import get_model_string

        cfg = from_dict({
            "paths": {"sample_dir": str(tmp_path)},
            "highres": {"variable": "temp"},
            "lowres": {"condition_variables": [], "scaling_methods": []},
        })
        rng = np.random.default_rng(0)
        sample_path = os.path.join(
            str(tmp_path), "generation", get_model_string(cfg), "generated_samples"
        )
        os.makedirs(sample_path, exist_ok=True)
        truth = rng.normal(size=(4, 32, 32))
        np.savez_compressed(os.path.join(sample_path, "gen_samples_multi_n_4.npz"), truth)
        np.savez_compressed(os.path.join(sample_path, "eval_samples_multi_n_4.npz"), truth)
        ev = Evaluation(cfg, generated_sample_type="multiple", n_samples=4)
        sp = ev.power_spectrum_comparison()
        assert sp["log_mse"] == pytest.approx(0.0, abs=1e-10)  # identical fields
        assert len(sp["wavelengths"]) == len(sp["spectrum_a"])


class TestAggregation:
    """Temporal aggregation parity (reference statistics.py:17-107)."""

    def _daily(self, n=40, h=3, w=4, start="2000-01-01"):
        import datetime

        t0 = datetime.datetime.fromisoformat(start)
        ts = [t0 + datetime.timedelta(days=i) for i in range(n)]
        rng = np.random.default_rng(0)
        fields = [rng.normal(size=(h, w)) for _ in range(n)]
        return fields, ts

    def test_daily_is_noop_stack(self):
        from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_fields

        fields, ts = self._daily(5)
        out = aggregate_fields(fields, ts, "daily")
        assert out["cutouts"].shape == (5, 3, 4)
        np.testing.assert_array_equal(out["cutouts"], np.stack(fields))

    def test_monthly_mean(self):
        from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_fields

        fields, ts = self._daily(62)  # jan + feb 2000 (leap: 31+29) + 2 march days
        out = aggregate_fields(fields, ts, "monthly", "mean")
        assert out["cutouts"].shape[0] == 3
        np.testing.assert_allclose(
            out["cutouts"][0], np.mean(np.stack(fields[:31]), axis=0)
        )
        assert out["timestamps"][0].day == 1 and out["timestamps"][0].month == 1

    def test_yearly_sum_and_max(self):
        import datetime

        from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_fields

        fields, ts = self._daily(10, start="2000-12-28")  # straddles the year
        for method, reduce in (("sum", np.sum), ("max", np.max)):
            out = aggregate_fields(fields, ts, "yearly", method)
            assert out["cutouts"].shape[0] == 2
            np.testing.assert_allclose(
                out["cutouts"][0], reduce(np.stack(fields[:4]), axis=0)
            )
            assert out["timestamps"][1] == datetime.datetime(2001, 1, 1)

    def test_weekly_iso_grouping(self):
        from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_fields

        # 2000-01-03 is a Monday: 14 days = exactly 2 ISO weeks
        fields, ts = self._daily(14, start="2000-01-03")
        out = aggregate_fields(fields, ts, "weekly", "min")
        assert out["cutouts"].shape[0] == 2
        np.testing.assert_allclose(
            out["cutouts"][1], np.min(np.stack(fields[7:]), axis=0)
        )

    def test_rejects_unknown(self):
        from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_fields

        fields, ts = self._daily(3)
        with pytest.raises(ValueError, match="aggregation_time"):
            aggregate_fields(fields, ts, "hourly")
        with pytest.raises(ValueError, match="method"):
            aggregate_fields(fields, ts, "monthly", "median")


class TestAggregateStream:
    """Constant-memory aggregation == the stacked reference implementation."""

    @pytest.mark.parametrize("agg_time,agg_method",
                             [("monthly", "mean"), ("weekly", "max"),
                              ("yearly", "sum"), ("monthly", "min")])
    def test_matches_aggregate_fields(self, agg_time, agg_method):
        import datetime

        from sbgm_danra_tpu.pipelines.stats_pipeline import (
            aggregate_fields, aggregate_stream,
        )

        t0 = datetime.datetime(2000, 12, 20)
        ts = [t0 + datetime.timedelta(days=i) for i in range(60)]
        rng = np.random.default_rng(3)
        fields = [rng.normal(size=(3, 4)) for _ in range(60)]

        ref = aggregate_fields(fields, ts, agg_time, agg_method)
        got = list(aggregate_stream(zip(fields, ts), agg_time, agg_method))
        assert [t for t, _ in got] == list(ref["timestamps"])
        np.testing.assert_allclose(
            np.stack([c for _, c in got]), ref["cutouts"], rtol=1e-12
        )


def test_aggregate_stream_rejects_out_of_order_periods():
    """Sorted input is an enforced precondition: a period key reappearing after
    its composite was emitted raises instead of silently splitting it."""
    import datetime

    from sbgm_danra_tpu.pipelines.stats_pipeline import aggregate_stream

    jan = datetime.datetime(2000, 1, 15)
    feb = datetime.datetime(2000, 2, 15)
    fields = [np.ones((2, 2))] * 3
    items = zip(fields, [jan, feb, jan])
    with pytest.raises(ValueError, match="reappeared"):
        list(aggregate_stream(items, "monthly", "mean"))


class TestReferenceFigureParity:
    """The remaining reference figure variants (evaluation.py:266-369 and
    utils.py:1206-1404) restored: pooled pixel histograms, per-pixel RMSE/MAE
    histograms, and the batch grid (rows=samples, cols=keys)."""

    def test_pixel_figures_written(self, tmp_path):
        import matplotlib

        matplotlib.use("Agg")
        from sbgm_danra_tpu.utils.plotting import (
            plot_error_histograms, plot_pixel_histograms,
        )

        rng = np.random.default_rng(0)
        gen, ref = rng.normal(size=400), rng.normal(size=400)
        p1 = str(tmp_path / "pixel_hist.png")
        p2 = str(tmp_path / "err_hist.png")
        plot_pixel_histograms(gen, ref, "mm", path=p1)
        plot_error_histograms(np.abs(gen - ref), np.abs(gen - ref), path=p2)
        assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0

    def test_plot_batch_grid(self, tmp_path):
        from sbgm_danra_tpu.utils.plotting import plot_batch_grid

        rng = np.random.default_rng(1)
        batch = {
            "prcp_hr": rng.normal(size=(4, 16, 16, 1)),
            "temp_lr": rng.normal(size=(4, 16, 16, 1)),
            "prcp_lr": rng.normal(size=(4, 16, 16, 1)),
            "lsm": (rng.random(size=(4, 16, 16, 1)) > 0.5).astype(np.float32),
            "sdf": rng.random(size=(4, 16, 16, 1)),
        }
        path = str(tmp_path / "grid.png")
        plot_batch_grid(batch, hr_var="prcp", n_samples=3, path=path)
        assert os.path.getsize(path) > 0

    def test_full_pixel_statistics_writes_figures(self, tmp_path):
        """Evaluation --mode evaluate figure parity, pinned on fabricated
        artifacts in the SampleGenerator layout."""
        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.evaluate.evaluation import Evaluation
        from sbgm_danra_tpu.utils.naming import get_model_string

        cfg = from_dict(
            {
                "paths": {"sample_dir": str(tmp_path)},
                "highres": {"variable": "prcp"},
                "lowres": {"condition_variables": ["temp"], "scaling_methods": ["zscore"]},
                "evaluation": {"n_repeats": 6},
            }
        )
        rng = np.random.default_rng(0)
        sample_path = os.path.join(
            str(tmp_path), "generation", get_model_string(cfg), "generated_samples"
        )
        os.makedirs(sample_path, exist_ok=True)
        truth = rng.normal(size=(1, 16, 16))
        members = truth + rng.normal(0, 0.3, size=(6, 16, 16))
        np.savez_compressed(os.path.join(sample_path, "gen_samples_repeated_6.npz"), members)
        np.savez_compressed(os.path.join(sample_path, "eval_samples_repeated_6.npz"), truth)

        ev = Evaluation(cfg, generated_sample_type="repeated", n_samples=6)
        stats = ev.full_pixel_statistics(save_stats=False, save_figs=True)
        assert stats["mae_all"].shape == (6 * 16 * 16,)
        for name in ("pixel_hist_repeated.png", "rmse_mae_hist_repeated.png"):
            f = os.path.join(ev.fig_path, name)
            assert os.path.exists(f) and os.path.getsize(f) > 0


class TestSpreadCalibration:
    """Ensemble inflation/deflation (evaluate/calibration.py) — beyond-reference
    post-processing for the measured overdispersion (BASELINE learned-model
    tables)."""

    def _overdispersed(self, factor=3.0, n=24, k=20, hw=12, seed=0):
        rng = np.random.default_rng(seed)
        truth_mean = rng.normal(size=(n, hw, hw))
        truth = truth_mean + rng.normal(size=(n, hw, hw))
        members = truth_mean[:, None] + factor * rng.normal(size=(n, k, hw, hw))
        return members, truth

    def test_closed_form_recovers_inflation(self):
        from sbgm_danra_tpu.evaluate.calibration import (
            ensemble_spread_skill,
            apply_spread_scale,
            spread_scale_closed_form,
        )

        members, truth = self._overdispersed(factor=3.0)
        alpha = spread_scale_closed_form(members, truth)
        assert 0.25 < alpha < 0.45  # true deflation ~1/3
        spread, rmse = ensemble_spread_skill(
            apply_spread_scale(members, alpha), truth
        )
        assert abs(spread * np.sqrt(21 / 20) / rmse - 1.0) < 0.05

    def test_crps_fit_improves_crps(self):
        from sbgm_danra_tpu.evaluate.calibration import (
            apply_spread_scale,
            fit_spread_scale,
        )
        from sbgm_danra_tpu.evaluate.crps import crps_ensemble

        members, truth = self._overdispersed(factor=3.0, seed=1)
        fit_m, fit_t = members[:12], truth[:12]       # "validation"
        hold_m, hold_t = members[12:], truth[12:]     # "test"
        alpha = fit_spread_scale(fit_m, fit_t, rule="crps")
        assert alpha < 0.6

        def mean_crps(m, t):
            return float(
                np.mean([crps_ensemble(m[i], t[i]).mean() for i in range(len(t))])
            )

        raw = mean_crps(hold_m, hold_t)
        cal = mean_crps(apply_spread_scale(hold_m, alpha), hold_t)
        # theory: Gaussian CRPS at 3x overdispersion is ~1.27x the calibrated
        # optimum, so expect a >=15% out-of-sample gain
        assert cal < raw * 0.85

    def test_underdispersed_inflates(self):
        from sbgm_danra_tpu.evaluate.calibration import fit_spread_scale

        members, truth = self._overdispersed(factor=0.3, seed=2)
        alpha = fit_spread_scale(members, truth, rule="spread_skill")
        assert alpha > 1.5

    def test_single_ensemble_layout(self):
        from sbgm_danra_tpu.evaluate.calibration import (
            apply_spread_scale,
            fit_spread_scale,
        )

        rng = np.random.default_rng(3)
        truth = rng.normal(size=(16, 16))
        members = 2.0 * rng.normal(size=(40, 16, 16))
        alpha = fit_spread_scale(members, truth, rule="spread_skill")
        cal = apply_spread_scale(members, alpha)
        assert cal.shape == members.shape
        np.testing.assert_allclose(cal.mean(axis=0), members.mean(axis=0), atol=1e-9)

    def test_calibration_preserves_mean_and_rejects_bad_rule(self):
        from sbgm_danra_tpu.evaluate.calibration import (
            apply_spread_scale,
            fit_spread_scale,
        )

        members, truth = self._overdispersed(n=4, k=8, seed=4)
        cal = apply_spread_scale(members, 0.5)
        np.testing.assert_allclose(cal.mean(axis=1), members.mean(axis=1), atol=1e-9)
        with pytest.raises(ValueError):
            fit_spread_scale(members, truth, rule="nope")


class TestRepeatedModeCalibrationKnob:
    """evaluation.spread_calibration deflates repeated-mode members in
    normalized space before back-transform (generation.py generate_repeated)."""

    def _generator(self, tmp_path, alpha):
        import jax.numpy as jnp

        from sbgm_danra_tpu.config import from_dict
        from sbgm_danra_tpu.evaluate.generation import SampleGenerator

        root = str(tmp_path)
        cfg = from_dict(
            {
                "experiment": {"name": "calib", "config_name": "calib"},
                "paths": {
                    "data_dir": root, "checkpoint_dir": root,
                    "sample_dir": os.path.join(root, "samples"),
                    "path_save": os.path.join(root, "samples"),
                    "lsm_path": os.path.join(root, "lsm.npz"),
                    "topo_path": os.path.join(root, "topo.npz"),
                    "stats_load_dir": os.path.join(root, "stats"),
                },
                "highres": {
                    "model": "DANRA", "variable": "temp", "data_size": [16, 16],
                    "scaling_method": "zscore", "full_domain_dims": [16, 16],
                    "cutout_domains": None, "buffer_frac": 0.0,
                },
                "lowres": {
                    "model": "ERA5", "condition_variables": [],
                    "scaling_methods": [], "full_domain_dims": [16, 16],
                },
                "sampler": {"sampler_type": "em_sampler", "n_timesteps": 4},
                "classifier_free_guidance": {"enabled": False},
                "evaluation": {
                    "n_steps": 4, "seed": 0, "n_repeats": 6,
                    "spread_calibration": alpha,
                },
            }
        )
        batch = {"temp_hr": np.zeros((1, 16, 16, 1), np.float32)}

        def score_fn(x, t, **kw):
            return jnp.zeros_like(x)

        return SampleGenerator(cfg, score_fn, [batch])

    def test_alpha_zero_collapses_members(self, tmp_path):
        gen_raw = self._generator(tmp_path / "raw", None).generate_repeated()
        assert gen_raw.shape[0] == 6
        assert gen_raw.std(axis=0).max() > 0.1  # noise-driven member spread

        gen_cal = self._generator(tmp_path / "cal", 0.0).generate_repeated()
        # alpha=0 deflates every member onto the ensemble mean
        np.testing.assert_allclose(gen_cal.std(axis=0), 0.0, atol=1e-4)

    def test_alpha_halves_spread(self, tmp_path):
        g1 = self._generator(tmp_path / "a", None)
        g2 = self._generator(tmp_path / "b", 0.5)
        m1 = g1.generate_repeated()
        m2 = g2.generate_repeated()
        # same seed/protocol: calibrated members are exactly the deflation
        np.testing.assert_allclose(
            m2, m1.mean(axis=0) + 0.5 * (m1 - m1.mean(axis=0)), atol=1e-5
        )
