"""Analysis pipelines: comparison (spectra), correlations, preprocess, data CLI."""

import os

import numpy as np
import pytest

from sbgm_danra_tpu.data import zarrlite
from sbgm_danra_tpu.data.paths import build_data_path
from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
from sbgm_danra_tpu.pipelines.comparison import (
    compare_fields,
    compare_power_spectra,
    compare_timeseries,
    compute_2d_power_spectrum,
    radial_average,
    run_comparison,
)
from sbgm_danra_tpu.pipelines.correlations import (
    compute_spatial_correlation,
    compute_temporal_correlation,
    run_correlations,
)
from sbgm_danra_tpu.pipelines.preprocess import (
    create_small_data_batches,
    fields_to_zarr,
    filter_store,
    npz_dir_to_zarr,
)


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("pipe_env"))
    generate(SyntheticSpec(root=root, full_domain=(32, 48), n_days=16, seed=1))
    return root


class TestPowerSpectra:
    def test_parseval_consistency(self):
        # sum of the 2D power spectrum == N * sum |x|^2 (Parseval, unnormalized FFT)
        rng = np.random.default_rng(0)
        f = rng.normal(size=(32, 32))
        p = compute_2d_power_spectrum(f)
        assert p.sum() == pytest.approx(f.size * np.sum(f**2), rel=1e-10)

    def test_radial_average_isotropic(self):
        # an isotropic field's radial spectrum must be smooth/positive
        rng = np.random.default_rng(1)
        p = compute_2d_power_spectrum(rng.normal(size=(64, 64)))
        r = radial_average(p)
        assert r.shape[0] >= 32 and (r >= 0).all()

    def test_smoother_field_has_redder_spectrum(self):
        from sbgm_danra_tpu.data.synthetic import smooth_noise

        rng = np.random.default_rng(2)
        smooth = [smooth_noise(rng, (64, 64), corr=0.05) for _ in range(4)]
        rough = [rng.normal(size=(64, 64)) for _ in range(4)]
        cmp = compare_power_spectra(smooth, rough, dx_km=2.5)
        # smooth field: more power at low k (long wavelengths), less at high k
        assert cmp.ratio[2] > 1.0
        assert cmp.ratio[-2] < 1.0
        assert np.isinf(cmp.wavelengths[0])
        assert cmp.wavelengths[1] == pytest.approx(64 * 2.5)

    def test_identical_fields_zero_logmse(self):
        rng = np.random.default_rng(3)
        f = [rng.normal(size=(32, 32)) for _ in range(3)]
        cmp = compare_power_spectra(f, f)
        assert cmp.log_mse == pytest.approx(0.0, abs=1e-12)
        assert cmp.mse == pytest.approx(0.0, abs=1e-6)


class TestComparisons:
    def test_compare_fields_metrics(self):
        a = np.ones((8, 8))
        b = np.zeros((8, 8)) + np.arange(8)
        out = compare_fields(a, b)
        assert out["bias"] == pytest.approx(1.0 - 3.5)
        assert out["diff_map"].shape == (8, 8)

    def test_timeseries_shapes(self):
        rng = np.random.default_rng(0)
        fa = [rng.normal(size=(8, 8)) for _ in range(5)]
        fb = [f + 0.1 for f in fa]
        out = compare_timeseries(fa, fb)
        assert out["bias"].shape == (5,)
        np.testing.assert_allclose(out["bias"], -0.1, rtol=1e-6)
        assert (out["corr"] > 0.99).all()

    def test_run_comparison_on_stores(self, env):
        out = run_comparison(
            build_data_path(env, "DANRA", "temp", (32, 48), "all"),
            build_data_path(env, "ERA5", "temp", (32, 48), "all"),
            "temp",
            by_season=True,
            max_days=8,
        )
        assert len(out["dates"]) == 8
        assert out["timeseries"]["corr"].mean() > 0.5
        assert "spectrum" in out and out["spectrum"]["log_mse"] >= 0


class TestCorrelations:
    def test_temporal_perfect(self):
        x = np.arange(10.0)
        assert compute_temporal_correlation(x, 2 * x + 3) == pytest.approx(1.0)
        assert compute_temporal_correlation(x, x**3, "spearman") == pytest.approx(1.0)

    def test_spatial_vectorized_matches_loop(self):
        rng = np.random.default_rng(0)
        a = rng.normal(size=(20, 6, 7))
        b = a + 0.5 * rng.normal(size=(20, 6, 7))
        got = compute_spatial_correlation(a, b)
        for i in range(6):
            for j in range(7):
                expected = np.corrcoef(a[:, i, j], b[:, i, j])[0, 1]
                assert got[i, j] == pytest.approx(expected, rel=1e-8)

    def test_run_correlations_on_stores(self, env):
        out = run_correlations(
            build_data_path(env, "DANRA", "temp", (32, 48), "all"),
            build_data_path(env, "ERA5", "temp", (32, 48), "all"),
            "temp",
            "temp",
            max_days=12,
        )
        assert out["temporal_pearson"] > 0.8  # LR is blurred HR
        assert out["spatial_pearson"].shape == (32, 48)


class TestPreprocess:
    def test_npz_roundtrip(self, tmp_path):
        npz_dir = tmp_path / "npz"
        npz_dir.mkdir()
        data = np.random.default_rng(0).normal(size=(8, 8)).astype(np.float32)
        np.savez(npz_dir / "temp_8x8_20000101.npz", data=data)
        n = npz_dir_to_zarr(str(npz_dir), str(tmp_path / "out.zarr"))
        assert n == 1
        g = zarrlite.open_group(str(tmp_path / "out.zarr"))
        np.testing.assert_array_equal(g["temp_8x8_20000101"]["data"][...], data)

    def test_filter_store(self, tmp_path):
        path = str(tmp_path / "s.zarr")
        fields_to_zarr(path, {
            "temp_8x8_20000101": np.ones((8, 8), np.float32),
            "temp_8x8_20000102": np.ones((4, 4), np.float32),          # bad shape
            "temp_8x8_20000103": np.full((8, 8), np.nan, np.float32),  # corrupt
        })
        report = filter_store(path, expected_shape=(8, 8))
        assert report["ok"] == ["temp_8x8_20000101"]
        assert report["bad_shape"] == ["temp_8x8_20000102"]
        assert report["corrupt"] == ["temp_8x8_20000103"]

    def test_small_batches(self, env, tmp_path):
        out_dir = str(tmp_path / "small")
        written = create_small_data_batches(
            env, out_dir,
            {"DANRA": ["temp", "prcp"], "ERA5": ["temp"]},
            (32, 48), n_samples=4,
        )
        assert all(v == 4 for v in written.values())
        g = zarrlite.open_group(
            build_data_path(out_dir, "DANRA", "temp", (32, 48), "all_small")
        )
        assert len(g.keys()) == 4


class TestDataCLI:
    def test_modes(self, env, tmp_path):
        import yaml

        from sbgm_danra_tpu.cli.main_data_app import main

        cfg = {
            "paths": {
                "data_dir": env,
                "stats_load_dir": os.path.join(env, "stats"),
            },
            "highres": {
                "model": "DANRA", "variable": "temp", "data_size": [16, 16],
                "full_domain_dims": [32, 48], "cutout_domains": [4, 28, 8, 40],
                "scaling_method": "zscore",
            },
            "lowres": {
                "model": "ERA5", "condition_variables": ["temp"],
                "scaling_methods": ["zscore"], "full_domain_dims": [32, 48],
            },
        }
        cfg_path = str(tmp_path / "data_cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        main(["--config_path", cfg_path, "--mode", "run_statistics"])
        # aggregated composite logging path (reference statistics.py:17-107)
        main(["--config_path", cfg_path, "--mode", "run_statistics",
              "--agg_time", "monthly", "--agg_method", "max"])
        main(["--config_path", cfg_path, "--mode", "run_comparison"])
        main(["--config_path", cfg_path, "--mode", "run_correlation"])
        main(["--config_path", cfg_path, "--mode", "create_small_batches",
              "--out_dir", str(tmp_path / "small"), "--n_samples", "3"])
        assert os.path.isdir(str(tmp_path / "small"))


class TestFigures:
    """The rebuilt data-analysis visualization layer (VERDICT r2 item 8;
    reference stats_analysis/plotting.py + correlation_plotting.py)."""

    def test_statistics_figures(self, env, tmp_path):
        from sbgm_danra_tpu.data.paths import build_data_path
        from sbgm_danra_tpu.pipelines.figures import (
            per_timestep_series,
            plot_variable_statistics,
        )

        store = build_data_path(env, "DANRA", "temp", (32, 48), "all")
        series = per_timestep_series(store, "temp", "DANRA", crop=(4, 28, 8, 40))
        assert len(series["dates"]) == 16
        assert series["pooled"].size > 0
        assert series["mean"].shape == (16,)
        written = plot_variable_statistics("temp", "DANRA", series, str(tmp_path))
        for key in ("field_example", "mean_std_time_series", "stats_panels",
                    "histogram_pixels", "histogram_time_series"):
            assert key in written and os.path.getsize(written[key]) > 0, key

    def test_correlation_figures(self, env, tmp_path):
        from sbgm_danra_tpu.data.paths import build_data_path
        from sbgm_danra_tpu.pipelines.figures import plot_correlation_figures

        out = run_correlations(
            build_data_path(env, "DANRA", "temp", (32, 48), "all"),
            build_data_path(env, "ERA5", "temp", (32, 48), "all"),
            "temp", "temp",
        )
        written = plot_correlation_figures(out, "temp", "temp", "DANRA", "ERA5",
                                           str(tmp_path))
        for key in ("temporal_series", "spatial_pearson", "spatial_spearman"):
            assert key in written and os.path.getsize(written[key]) > 0, key

    def test_cli_figures_flag(self, env, tmp_path):
        import yaml

        from sbgm_danra_tpu.cli.main_data_app import main

        cfg = {
            "paths": {
                "data_dir": env,
                "stats_load_dir": os.path.join(env, "stats"),
                "sample_dir": str(tmp_path / "samples"),
            },
            "highres": {
                "model": "DANRA", "variable": "temp", "data_size": [16, 16],
                "full_domain_dims": [32, 48], "cutout_domains": [4, 28, 8, 40],
                "scaling_method": "zscore",
            },
            "lowres": {
                "model": "ERA5", "condition_variables": ["temp"],
                "scaling_methods": ["zscore"], "full_domain_dims": [32, 48],
            },
        }
        cfg_path = str(tmp_path / "data_cfg.yaml")
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        main(["--config_path", cfg_path, "--mode", "run_statistics", "--figures",
              "--max_days", "8"])
        stats_dir = str(tmp_path / "samples" / "figures" / "statistics")
        assert os.path.isdir(stats_dir) and len(os.listdir(stats_dir)) >= 8
        main(["--config_path", cfg_path, "--mode", "run_correlation", "--figures"])
        corr_dir = str(tmp_path / "samples" / "figures" / "correlations")
        assert os.path.isdir(corr_dir) and len(os.listdir(corr_dir)) >= 3
