"""Day-sharded data-parallel sampling (parallel/windowed_dp.py): window
buffers sharded over the mesh's day axis, per-device local sampling under
shard_map, and integration with the DP train step and the windowed loader."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sbgm_danra_tpu.data.factory import make_dataset
from sbgm_danra_tpu.data.windowed_data import WindowedDeviceLoader
from sbgm_danra_tpu.parallel.mesh import make_mesh
from sbgm_danra_tpu.parallel.windowed_dp import (
    day_sharded_buffers,
    make_dp_batch_sampler,
)

from tests.test_training import synth_env, tiny_config  # noqa: F401 (fixture)


D, H, W = 32, 24, 24
CROP = (8, 8)
B = 16  # global batch


@pytest.fixture(scope="module")
def mesh(devices):
    return make_mesh({"data": 8})


def _toy_buffers():
    """hr[d] == d everywhere: a sampled crop's value IS its source day."""
    hr = jnp.broadcast_to(
        jnp.arange(D, dtype=jnp.float32)[:, None, None], (D, H, W)
    )
    lr = jnp.zeros((D, H, W, 2), jnp.float32)
    lsm = jnp.ones((H, W), jnp.float32)
    topo = jnp.zeros((H, W), jnp.float32)
    classifier = jnp.arange(D, dtype=jnp.int32) % 4 + 1
    return hr, lr, lsm, topo, classifier


class TestDaySharding:
    def test_buffers_shard_and_replicate(self, mesh):
        bufs = day_sharded_buffers(_toy_buffers(), mesh)
        hr, lr, lsm, topo, classifier = bufs
        assert hr.sharding.spec == P("data")
        assert lr.sharding.spec == P("data")
        assert classifier.sharding.spec == P("data")
        assert hr.addressable_shards[0].data.shape == (D // 8, H, W)
        # statics replicate
        assert lsm.addressable_shards[0].data.shape == (H, W)

    def test_nondivisible_days_trimmed(self, mesh):
        hr, lr, lsm, topo, classifier = _toy_buffers()
        bufs = day_sharded_buffers(
            (hr[:29], lr[:29], lsm, topo, classifier[:29]), mesh
        )
        assert bufs[0].shape[0] == 24

    def test_too_few_days_rejected(self, mesh):
        hr, lr, lsm, topo, classifier = _toy_buffers()
        with pytest.raises(ValueError, match="at least"):
            day_sharded_buffers(
                (hr[:4], lr[:4], lsm, topo, classifier[:4]), mesh
            )


class TestDpSampler:
    @pytest.fixture(scope="class")
    def sampled(self, mesh):
        bufs = day_sharded_buffers(_toy_buffers(), mesh)
        sampler = make_dp_batch_sampler(
            mesh, D, (H, W), 2, CROP, None, B,
            cfg_dropout_prob=0.0, with_sdf=False,
        )
        batch = sampler(jax.random.PRNGKey(0), *bufs)
        return batch

    def test_global_batch_shape_and_sharding(self, sampled):
        assert sampled["x"].shape == (B, *CROP, 1)
        assert sampled["x"].sharding.spec[0] == "data"
        assert sampled["y"].shape == (B,)

    def test_rows_come_from_local_day_shards(self, sampled):
        """Device i's quota of B/8 rows must be drawn from days
        [i*D/8, (i+1)*D/8) — per-device locality, no cross-shard gather."""
        days = np.asarray(sampled["x"])[:, 0, 0, 0].astype(int)
        per_dev = B // 8
        shard_days = D // 8
        for i in range(8):
            rows = days[i * per_dev: (i + 1) * per_dev]
            assert (rows >= i * shard_days).all() and (
                rows < (i + 1) * shard_days
            ).all(), f"device {i} sampled days {rows}"

    def test_devices_draw_independent_days(self, sampled):
        """fold_in(axis_index) decorrelates devices: the per-device LOCAL day
        offsets must not all coincide (they would with an unfolded key)."""
        days = np.asarray(sampled["x"])[:, 0, 0, 0].astype(int)
        local = days.reshape(8, B // 8) % (D // 8)
        assert len({tuple(r) for r in local}) > 1

    def test_classifier_matches_sampled_day(self, sampled):
        days = np.asarray(sampled["x"])[:, 0, 0, 0].astype(int)
        np.testing.assert_array_equal(
            np.asarray(sampled["y"]), days % 4 + 1
        )

    def test_global_batch_must_divide(self, mesh):
        with pytest.raises(ValueError, match="devices"):
            make_dp_batch_sampler(mesh, D, (H, W), 2, CROP, None, 12)


class TestWindowedDpIntegration:
    def test_windowed_buffers_through_dp_train_step(self, mesh, synth_env):  # noqa: F811
        """The full loop the design intends: a windowed loader's current
        window, day-sharded over the mesh, sampled per-device, fed to the
        GSPMD DP train step — one step runs, finite loss, no collective in
        the input path (sampling is shard_map over local shards)."""
        from sbgm_danra_tpu.models.unet import build_score_model
        from sbgm_danra_tpu.parallel.train import make_parallel_steps
        from sbgm_danra_tpu.sde import VESDE
        from sbgm_danra_tpu.training.pipeline import model_spec_from_config
        from sbgm_danra_tpu.training.state import create_train_state

        cfg = tiny_config(synth_env)
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=8, window_days=16,
            seed=0, layout="strided",
        )
        bufs = day_sharded_buffers(loader.buffers(), mesh)
        ds = loader.dataset
        sampler = make_dp_batch_sampler(
            mesh, bufs[0].shape[0], tuple(bufs[2].shape), bufs[1].shape[-1],
            tuple(ds.hr_data_size),
            ds.cutout_domains if ds.cutouts else None,
            batch_size=8,
            cfg_dropout_prob=0.1,
            with_sdf=ds.sdf_weighted_loss,
        )
        batch = sampler(jax.random.PRNGKey(3), *bufs)
        assert batch["x"].sharding.spec[0] == "data"

        sde = VESDE()
        model = build_score_model(model_spec_from_config(cfg), sde)
        init = {k: v for k, v in batch.items()
                if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")}
        state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
        train_step, _, placed, _ = make_parallel_steps(
            model, sde, cfg, state, mesh
        )
        placed, metrics = train_step(placed, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
