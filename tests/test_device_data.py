"""Device-resident dataset: parity with the host loader + pipeline integration.

The compiled sampler must reproduce DanraDataset.__getitem__ semantics
(transform-then-crop == crop-then-transform, rows-first crops inside
cutout_domains, device-JFA SDF == host EDT, CFG dropout protocol)."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.data.device_data import (
    DeviceDataLoader,
    build_device_stacks,
    make_batch_sampler,
)
from sbgm_danra_tpu.data.factory import make_dataset, make_loaders
from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
from sbgm_danra_tpu.ops.sdf import sdf_from_mask

from tests.test_training import tiny_config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("device_data"))
    generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=16,
                           crop_region=(8, 40, 16, 56)))
    cfg = tiny_config(root)
    return root, cfg


@pytest.fixture(scope="module")
def stacks_and_dataset(env):
    _, cfg = env
    dataset = make_dataset(cfg, "train")
    return build_device_stacks(dataset), dataset


class TestStacks:
    def test_fields_match_host_transform_path(self, stacks_and_dataset):
        """Full-domain stack slices == the host loader's transformed fields."""
        stacks, ds = stacks_and_dataset
        full_hw = ds.lsm_full_domain.shape
        for i in (0, len(ds.common_dates) - 1):
            date = ds.common_dates[i]
            want_hr = ds._load_field(
                ds.hr, ds._hr_group, ds._hr_map[date], None, full_hw
            )
            np.testing.assert_allclose(
                np.asarray(stacks.hr[i]), want_hr, rtol=1e-6, atol=1e-6
            )
            for ci, name in enumerate(stacks.lr_names):
                src = next(c for c in ds.lr_conditions if c.name == name)
                want = ds._load_field(
                    src, ds._lr_groups[name], ds._lr_maps[name][date], None, full_hw
                )
                np.testing.assert_allclose(
                    np.asarray(stacks.lr[i, ..., ci]), want, rtol=1e-6, atol=1e-6
                )

    def test_classifier_matches_dates(self, stacks_and_dataset):
        from sbgm_danra_tpu.data.dataset import classifier_from_date

        stacks, ds = stacks_and_dataset
        want = [classifier_from_date(d, ds.n_classes) for d in ds.common_dates]
        np.testing.assert_array_equal(np.asarray(stacks.classifier), want)

    def test_rejects_resize_factor(self, env):
        _, cfg = env
        ds = make_dataset(cfg, "train")
        ds.resize_factor = 2
        with pytest.raises(ValueError):
            build_device_stacks(ds)

    def test_rejects_whole_domain_resize_semantics(self, env):
        """cutouts=False means whole-domain-RESIZE on the host path; the
        device sampler only crops, so it must refuse rather than silently
        train on random sub-windows."""
        _, cfg = env
        ds = make_dataset(cfg, "train")
        ds.cutouts = False  # hr_data_size != full domain
        with pytest.raises(ValueError, match="cutouts"):
            build_device_stacks(ds)

    def test_sdf_gate_follows_dataset_flag(self, env):
        """DeviceDataLoader defaults with_sdf to dataset.sdf_weighted_loss —
        the same gate as the host __getitem__ — so the two paths always
        train the same objective (and no jump-flood runs for an unused
        output)."""
        _, cfg = env
        ds = make_dataset(cfg, "train")
        ds.sdf_weighted_loss = False
        loader = DeviceDataLoader(ds, batch_size=2)
        batch = loader.sample(jax.random.PRNGKey(0))
        assert "sdf" not in batch
        ds2 = make_dataset(cfg, "train")
        ds2.sdf_weighted_loss = True
        loader2 = DeviceDataLoader(ds2, batch_size=2)
        assert "sdf" in loader2.sample(jax.random.PRNGKey(0))


class TestSampler:
    def test_crops_are_exact_slices(self, stacks_and_dataset):
        """Replicate the sampler's RNG stream and check each sample is the
        exact rows-first slice of the right day inside the cutout window."""
        stacks, ds = stacks_and_dataset
        b, (ch, cw) = 6, tuple(ds.hr_data_size)
        x1, x2, y1, y2 = ds.cutout_domains
        sampler = make_batch_sampler(
            stacks, (ch, cw), ds.cutout_domains, batch_size=b, cfg_dropout_prob=0.0
        )
        key = jax.random.PRNGKey(7)
        batch = sampler(key)

        kd, kx, ky, _ = jax.random.split(key, 4)
        day = np.asarray(jax.random.randint(kd, (b,), 0, stacks.n_days))
        ox = x1 + np.asarray(jax.random.randint(kx, (b,), 0, x2 - x1 - ch + 1))
        oy = y1 + np.asarray(jax.random.randint(ky, (b,), 0, y2 - y1 - cw + 1))
        hr_np = np.asarray(stacks.hr)
        lr_np = np.asarray(stacks.lr)
        topo_np = np.asarray(stacks.topo)
        for i in range(b):
            np.testing.assert_array_equal(
                np.asarray(batch["x"][i, ..., 0]),
                hr_np[day[i], ox[i] : ox[i] + ch, oy[i] : oy[i] + cw],
            )
            np.testing.assert_array_equal(
                np.asarray(batch["cond_img"][i]),
                lr_np[day[i], ox[i] : ox[i] + ch, oy[i] : oy[i] + cw],
            )
            np.testing.assert_array_equal(
                np.asarray(batch["topo_cond"][i, ..., 0]),
                topo_np[ox[i] : ox[i] + ch, oy[i] : oy[i] + cw],
            )
            assert int(batch["y"][i]) == int(stacks.classifier[day[i]])
        # mask channel present (no dropout => all ones)
        assert float(batch["lsm_cond"][..., 1].min()) == 1.0

    def test_sdf_matches_host_edt(self, stacks_and_dataset):
        stacks, ds = stacks_and_dataset
        sampler = make_batch_sampler(
            stacks, tuple(ds.hr_data_size), ds.cutout_domains, batch_size=4
        )
        batch = sampler(jax.random.PRNGKey(3))
        for i in range(4):
            mask = np.asarray(batch["lsm_hr"][i, ..., 0])
            want = sdf_from_mask(mask)
            np.testing.assert_allclose(
                np.asarray(batch["sdf"][i, ..., 0]), want, atol=1e-4
            )
        assert float(batch["sdf"].min()) >= 0.0 and float(batch["sdf"].max()) <= 1.0

    def test_cfg_dropout_protocol(self, stacks_and_dataset):
        """Dropped samples: zero cond_img, zero geo MASK channel (value kept),
        class 0; drop rate ~ p."""
        stacks, ds = stacks_and_dataset
        p = 0.5
        sampler = make_batch_sampler(
            stacks, tuple(ds.hr_data_size), ds.cutout_domains,
            batch_size=64, cfg_dropout_prob=p,
        )
        dropped = kept = 0
        for s in range(6):
            batch = sampler(jax.random.PRNGKey(100 + s))
            mask = np.asarray(batch["lsm_cond"][..., 1])
            is_dropped = mask.reshape(64, -1).max(axis=1) == 0.0
            dropped += int(is_dropped.sum())
            kept += int((~is_dropped).sum())
            cond = np.asarray(batch["cond_img"]).reshape(64, -1)
            y = np.asarray(batch["y"])
            topo_val = np.asarray(batch["topo_cond"][..., 0]).reshape(64, -1)
            assert (np.abs(cond[is_dropped]).max(initial=0.0)) == 0.0
            assert (y[is_dropped] == 0).all()
            assert (y[~is_dropped] > 0).all()
            # geo VALUE channel survives dropout (reference zeroes mask only)
            assert np.abs(topo_val[is_dropped]).max(initial=0.0) > 0.0
        frac = dropped / (dropped + kept)
        assert 0.35 < frac < 0.65, frac

    def test_epoch_reproducibility(self, env):
        _, cfg = env
        loader = DeviceDataLoader(
            make_dataset(cfg, "train"), batch_size=4, steps_per_epoch=2, seed=5,
            cfg_dropout_prob=0.1,
        )
        loader.set_epoch(0)
        a = [np.asarray(b["x"]) for b in loader]
        loader.set_epoch(0)
        b_ = [np.asarray(b["x"]) for b in loader]
        for u, v in zip(a, b_):
            np.testing.assert_array_equal(u, v)
        # next epoch differs
        c = [np.asarray(b["x"]) for b in loader]
        assert not np.array_equal(a[0], c[0])


class TestPipelineIntegration:
    def test_train_with_device_dataset(self, env):
        """End-to-end: cfg.data_handling.device_dataset trains through the
        standard pipeline (EMA, scheduler, checkpointing untouched)."""
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline

        _, cfg = env
        cfg = dataclasses.replace(cfg) if dataclasses.is_dataclass(cfg) else cfg
        cfg.data_handling.device_dataset = True
        cfg.training.steps_per_epoch = 2
        train_loader, valid_loader, _ = make_loaders(cfg)
        assert getattr(train_loader, "is_device_loader", False)
        pipe = TrainingPipeline(cfg, train_loader, valid_loader)
        hist = pipe.train(epochs=2, steps_per_epoch=2)
        assert len(hist["train_loss"]) == 2
        assert np.isfinite(hist["train_loss"]).all()
        assert np.isfinite(hist["val_loss"]).all()
