"""Multi-variable conditioning (BASELINE config 3: 6-8 channel UNet) and
per-epoch preview sampling."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
from sbgm_danra_tpu.sde import VESDE, dsm_loss


class TestMultiVariableConditioning:
    def test_eight_channel_conditioning(self):
        """t2m, precip, u/v wind, MSLP, CAPE (6 LR) + lsm+topo geo = 10 cond
        channels (the run_full_pipeline_multi_channels recipe)."""
        n_lr = 6
        spec = ModelSpec(
            in_channels=n_lr + 4, time_embedding=32, last_fmap_channels=64,
            num_heads=2, block_layers=(1, 1, 1, 1), num_classes=4,
        )
        model = build_score_model(spec, VESDE())
        rng = np.random.default_rng(0)
        b, s = 2, 32
        kwargs = dict(
            x=jnp.asarray(rng.normal(size=(b, s, s, 1)).astype(np.float32)),
            t=jnp.full((b,), 0.5),
            y=jnp.array([1, 2]),
            cond_img=jnp.asarray(rng.normal(size=(b, s, s, n_lr)).astype(np.float32)),
            lsm_cond=jnp.zeros((b, s, s, 2)),
            topo_cond=jnp.zeros((b, s, s, 2)),
        )
        variables = model.init({"params": jax.random.PRNGKey(0)}, **kwargs, train=False)
        out = model.apply(variables, **kwargs, train=False)
        assert out.shape == (b, s, s, 1)

        def score_fn(x_t, t, **cond):
            return model.apply(variables, x_t, t, **cond, train=False)

        loss = dsm_loss(
            score_fn, kwargs["x"], jax.random.PRNGKey(1),
            y=kwargs["y"], cond_img=kwargs["cond_img"],
            lsm_cond=kwargs["lsm_cond"], topo_cond=kwargs["topo_cond"],
        )
        assert np.isfinite(float(loss))

    def test_multivar_dataset_channel_order(self, tmp_path):
        """Multiple LR variables concat in sorted key order through the loader."""
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.data.loader import extract_batch
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from tests.test_training import tiny_config

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=8,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        cfg.lowres.condition_variables = ("temp", "prcp")
        cfg.lowres.scaling_methods = ("zscore", "log_zscore")
        train_loader, _, _ = make_loaders(cfg)
        batch = extract_batch(next(iter(train_loader)), cfg.highres.variable)
        # sorted: prcp_lr then temp_lr
        assert batch["cond_img"].shape[-1] == 2
        assert cfg.in_channels() == 2 + 4

    ALL_VARS = ("temp", "prcp", "cape", "ewvf", "nwvf", "msl",
                "z_pl_250", "z_pl_500", "z_pl_850", "z_pl_1000")

    def test_all_data_variable_set_end_to_end(self, tmp_path):
        """The full all_data.yaml conditioning set (10 LR variables incl. the
        pressure-level geopotentials, reference
        full_run_all_data_config.yaml:47-56): synthetic stores + stats for
        every variable, loader yields 10 sorted cond channels, units
        corrected (ERA5 msl Pa->hPa, z_pl geopotential->height)."""
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.data.loader import extract_batch
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from tests.test_training import tiny_config

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=8,
                               crop_region=(8, 40, 16, 56),
                               variables=self.ALL_VARS))
        cfg = tiny_config(root)
        cfg.lowres.condition_variables = self.ALL_VARS
        cfg.lowres.scaling_methods = (
            "zscore", "log_zscore", "log_zscore", "zscore", "zscore",
            "zscore", "zscore", "zscore", "zscore", "zscore",
        )
        train_loader, _, _ = make_loaders(cfg)
        batch = extract_batch(next(iter(train_loader)), cfg.highres.variable)
        assert batch["cond_img"].shape[-1] == len(self.ALL_VARS)
        assert cfg.in_channels() == 10 + 4
        assert np.isfinite(np.asarray(batch["cond_img"])).all()

    def test_synthetic_units_are_storage_units(self, tmp_path):
        """ERA5 stores raw units (msl in Pa, z_pl as geopotential) so the
        unit-correction path is exercised; after correction the HR/LR fields
        agree in magnitude."""
        from sbgm_danra_tpu.data.synthetic import daily_fields, make_geography
        from sbgm_danra_tpu.utils.units import correct_variable_units

        rng = np.random.default_rng(0)
        _, topo = make_geography(rng, (32, 48))
        day = daily_fields(rng, "20000701", (32, 48), topo, self.ALL_VARS)
        assert day["ERA5"]["msl"].mean() > 5e4        # Pa
        assert day["DANRA"]["msl"].mean() < 2e3       # hPa
        for var in ("msl", "z_pl_500", "cape"):
            lr = correct_variable_units(var, "ERA5", day["ERA5"][var])
            hr = correct_variable_units(var, "DANRA", day["DANRA"][var])
            assert np.abs(lr.mean() - hr.mean()) < 0.2 * (abs(hr.mean()) + 1.0)

    def test_unknown_variable_raises(self, tmp_path):
        from sbgm_danra_tpu.data.synthetic import daily_fields, make_geography

        rng = np.random.default_rng(0)
        _, topo = make_geography(rng, (16, 16))
        with pytest.raises(ValueError, match="no recipe"):
            daily_fields(rng, "20000101", (16, 16), topo, ("temp", "blorp"))


class TestPreviewSampling:
    def test_previews_written_during_training(self, tmp_path):
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline
        from tests.test_training import tiny_config

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=12,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        cfg.visualization.preview_every = 1
        cfg.sampler.n_timesteps = 5
        train_loader, valid_loader, gen_loader = make_loaders(cfg)
        pipe = TrainingPipeline(
            cfg, train_loader, valid_loader, gen_loader=gen_loader
        )
        pipe.train(epochs=1, steps_per_epoch=2)
        previews = glob.glob(
            os.path.join(cfg.paths.sample_dir, "preview_*_epoch1.png")
        )
        assert previews, os.listdir(cfg.paths.sample_dir)

    def test_generate_previews_returns_samples(self, tmp_path):
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline
        from tests.test_training import tiny_config

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=8,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        train_loader, _, gen_loader = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, None, gen_loader=gen_loader)
        out = pipe.generate_previews(n_steps=4)
        assert out is not None and out.shape[1:] == (32, 32)
        assert np.isfinite(out).all()

    def test_no_gen_loader_is_noop(self, tmp_path):
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline
        from tests.test_training import tiny_config

        root = str(tmp_path)
        generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=8,
                               crop_region=(8, 40, 16, 56)))
        cfg = tiny_config(root)
        train_loader, _, _ = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, None)
        assert pipe.generate_previews() is None
