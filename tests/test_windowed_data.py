"""Rotating-window (>HBM) device loader: window contents, scheduling,
refill semantics, and pipeline integration (data/windowed_data.py)."""

import jax
import numpy as np
import pytest

from sbgm_danra_tpu.data.device_data import DeviceDataLoader, load_days
from sbgm_danra_tpu.data.factory import make_dataset, make_loaders
from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
from sbgm_danra_tpu.data.windowed_data import WindowedDeviceLoader

from tests.test_training import tiny_config


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("windowed_data"))
    generate(SyntheticSpec(root=root, full_domain=(48, 64), n_days=20,
                           crop_region=(8, 40, 16, 56)))
    cfg = tiny_config(root)
    return root, cfg


def _loader(cfg, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("window_days", 6)
    return WindowedDeviceLoader(make_dataset(cfg, "train"), **kw)


class TestWindows:
    def test_block_dates_cover_archive_and_wrap(self, env):
        _, cfg = env
        loader = _loader(cfg)
        dates = loader.dates
        seen = []
        for b in range(loader.n_windows):
            block = loader._block_dates(b)
            assert len(block) == loader.window_days  # every window full-size
            seen.extend(block)
        # all archive dates appear; the tail window wraps to the start
        assert set(seen) == set(dates)
        last = loader._block_dates(loader.n_windows - 1)
        n_tail = len(dates) - (loader.n_windows - 1) * loader.window_days
        assert last[n_tail:] == list(dates[: loader.window_days - n_tail])

    def test_window_buffers_match_host_load(self, env):
        """The resident window is exactly load_days of its block dates."""
        _, cfg = env
        loader = _loader(cfg)
        ds = loader.dataset
        hr, lr, classes = load_days(ds, loader._block_dates(0))
        np.testing.assert_allclose(
            np.asarray(loader._current.hr), hr, rtol=1e-6, atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(loader._current.lr), lr, rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(loader._current.classifier), classes)

    def test_batches_have_model_contract(self, env):
        _, cfg = env
        loader = _loader(cfg, window_steps=2)
        batch = next(iter(loader))
        for key in ("x", "cond_img", "lsm_cond", "topo_cond", "y"):
            assert key in batch, key
        assert batch["x"].shape[1:3] == tuple(loader.dataset.hr_data_size)
        assert np.isfinite(np.asarray(batch["x"])).all()

    def test_epoch_visits_every_window_fixed_mode(self, env):
        _, cfg = env
        loader = _loader(cfg, window_steps=3)
        visited = []
        it = iter(loader)
        for _ in range(len(loader)):
            next(it)
            if not visited or visited[-1] != loader._current.block:
                visited.append(loader._current.block)
        assert sorted(visited) == list(range(loader.n_windows))
        # fixed mode: exactly window_steps batches per window
        assert len(loader) == loader.n_windows * 3

    def test_schedule_is_seeded_permutation_rotated_to_current(self, env):
        _, cfg = env
        loader = _loader(cfg)
        s0 = loader._schedule(0)
        assert sorted(s0) == list(range(loader.n_windows))
        assert s0[0] == loader._current.block  # no redundant reload
        assert loader._schedule(0) == s0  # deterministic per epoch
        assert sorted(loader._schedule(1)) == list(range(loader.n_windows))

    def test_swap_on_ready_mode_swaps_and_finishes(self, env):
        _, cfg = env
        loader = _loader(cfg, min_window_steps=1)
        n = sum(1 for _ in loader)
        assert n >= loader.n_windows  # at least min_window_steps per window
        assert loader.n_swaps == loader.n_windows - 1
        assert loader.epoch == 1

    def test_single_window_degenerates_gracefully(self, env):
        _, cfg = env
        loader = _loader(cfg, window_days=999, window_steps=2)
        assert loader.n_windows == 1
        assert sum(1 for _ in loader) == 2

    def test_steps_per_epoch_budget(self, env):
        _, cfg = env
        loader = _loader(cfg, window_steps=4, steps_per_epoch=5)
        assert len(loader) == 5
        assert sum(1 for _ in loader) == 5

    def test_staging_failure_surfaces(self, env):
        _, cfg = env
        loader = _loader(cfg, window_steps=1)

        def boom(block):
            raise OSError("disk gone")

        loader._load_window_host = boom
        with pytest.raises(RuntimeError, match="window staging failed"):
            for _ in loader:
                pass


class TestStaging:
    def test_chunked_upload_matches_monolithic(self, env, monkeypatch):
        """Slicing the window into ~chunk-size day-groups and concatenating on
        device must reproduce the host array exactly (the throughput path the
        stage probe measured 2x faster over the tunnel)."""
        import sbgm_danra_tpu.data.windowed_data as wd

        _, cfg = env
        # force multi-chunk staging even on the tiny test archive
        monkeypatch.setattr(wd, "_STAGE_CHUNK_BYTES", 1)
        loader = _loader(cfg)
        hr, lr, _ = load_days(loader.dataset, loader._block_dates(0))
        np.testing.assert_array_equal(np.asarray(loader._current.hr), hr)
        np.testing.assert_array_equal(np.asarray(loader._current.lr), lr)

    def test_bfloat16_staging(self, env):
        """bf16 windows: buffers and batches are bf16, values within bf16
        quantization of the f32 host load (device_window_dtype knob)."""
        import jax.numpy as jnp

        _, cfg = env
        loader = _loader(cfg, dtype=jnp.bfloat16, window_steps=2)
        assert loader._current.hr.dtype == jnp.bfloat16
        hr, _, _ = load_days(loader.dataset, loader._block_dates(0))
        np.testing.assert_allclose(
            np.asarray(loader._current.hr, dtype=np.float32), hr,
            rtol=8e-3, atol=8e-3,
        )
        batch = next(iter(loader))
        assert batch["x"].dtype == jnp.bfloat16
        assert np.isfinite(np.asarray(batch["x"], dtype=np.float32)).all()

    def test_factory_wires_stage_dtype(self, env):
        import copy

        import jax.numpy as jnp

        _, cfg = env
        c = copy.deepcopy(cfg)
        c.data_handling.device_dataset = True
        c.data_handling.device_window_days = 6
        c.data_handling.device_window_steps = 2
        c.data_handling.device_window_dtype = "bfloat16"
        train, _, _ = make_loaders(c)
        assert train._current.hr.dtype == jnp.bfloat16


class TestParityWithResident:
    def test_same_program_as_resident_sampler(self, env):
        """A windowed loader whose window IS the whole split must draw
        byte-identical batches to DeviceDataLoader under the same key (they
        share make_batch_sampler; the window buffers are the stacks)."""
        _, cfg = env
        ds = make_dataset(cfg, "train")
        resident = DeviceDataLoader(ds, batch_size=2, seed=0)
        windowed = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=2,
            window_days=len(resident.dataset.common_dates), seed=0,
        )
        key = jax.random.PRNGKey(7)
        a = resident.sample(key)
        b = windowed.sample(key)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]), err_msg=k)


class TestFactoryAndPipeline:
    def test_factory_switch(self, env):
        _, cfg = env
        import copy

        c = copy.deepcopy(cfg)
        c.data_handling.device_dataset = True
        c.data_handling.device_window_days = 6
        c.data_handling.device_window_steps = 2
        train, valid, _ = make_loaders(c)
        assert isinstance(train, WindowedDeviceLoader)
        assert isinstance(valid, DeviceDataLoader)  # valid stays resident

    def test_train_through_pipeline(self, env):
        """End-to-end: one epoch of TrainingPipeline over rotating windows."""
        import copy

        from sbgm_danra_tpu.training.pipeline import TrainingPipeline

        _, cfg = env
        c = copy.deepcopy(cfg)
        c.data_handling.device_dataset = True
        c.data_handling.device_window_days = 8
        c.data_handling.device_window_steps = 2
        train, valid, _ = make_loaders(c)
        pipe = TrainingPipeline(c, train, valid)
        hist = pipe.train(epochs=1)
        assert np.isfinite(hist["train_loss"][0])
        assert train.n_swaps >= 1
