"""Training engine: optimizer/EMA/scheduler semantics, checkpoint round-trip,
and a real end-to-end smoke train on synthetic data (loss must decrease)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.config import Config, from_dict
from sbgm_danra_tpu.data.factory import make_loaders
from sbgm_danra_tpu.data.synthetic import SyntheticSpec, generate
from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.training.checkpointing import CheckpointManager
from sbgm_danra_tpu.training.pipeline import TrainingPipeline, model_spec_from_config
from sbgm_danra_tpu.training.schedulers import (
    CosineAnnealingLR,
    EarlyStopping,
    ReduceLROnPlateau,
    StepLR,
    make_scheduler,
)
from sbgm_danra_tpu.training.state import create_train_state, model_variables
from sbgm_danra_tpu.training.train_step import make_eval_step, make_train_step


def tiny_config(root: str) -> Config:
    return from_dict(
        {
            "experiment": {"name": "tiny", "config_name": "tiny"},
            "paths": {
                "data_dir": root,
                "checkpoint_dir": os.path.join(root, "ckpt"),
                "sample_dir": os.path.join(root, "samples"),
                "path_save": os.path.join(root, "samples"),
                "lsm_path": os.path.join(root, "data_lsm/truth_fullDomain/lsm_full.npz"),
                "topo_path": os.path.join(root, "data_topo/truth_fullDomain/topo_full.npz"),
                "stats_load_dir": os.path.join(root, "stats"),
            },
            "highres": {
                "model": "DANRA", "variable": "temp", "data_size": [32, 32],
                "scaling_method": "zscore", "full_domain_dims": [48, 64],
                "cutout_domains": [8, 40, 16, 56], "buffer_frac": 0.2,
            },
            "lowres": {
                "model": "ERA5", "condition_variables": ["temp"],
                "scaling_methods": ["zscore"], "full_domain_dims": [48, 64],
                "buffer_frac": 0.2,
            },
            "sampler": {
                "sampler_type": "em_sampler", "n_timesteps": 20,
                "time_embedding": 32, "last_fmap_channels": 64, "num_heads": 2,
                "block_layers": [1, 1, 1, 1],
            },
            "data_handling": {"cache_size": 0, "num_workers": 2, "n_gen_samples": 2},
            "training": {
                "seed": 0, "batch_size": 4, "learning_rate": 1e-3,
                "epochs": 2, "with_ema": True, "ema_decay": 0.99,
                "sdf_weighted_loss": True, "early_stopping": False,
                "lr_scheduler": "none", "monitor_extremes": False,
            },
            "classifier_free_guidance": {"enabled": True, "drop_prob": 0.1},
        }
    )


@pytest.fixture(scope="module")
def synth_env(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("train_env"))
    generate(
        SyntheticSpec(
            root=root, full_domain=(48, 64), n_days=24,
            crop_region=(8, 40, 16, 56), seed=0,
        )
    )
    return root


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(0)
    b, s = 4, 32
    return {
        "x": jnp.asarray(rng.normal(size=(b, s, s, 1)).astype(np.float32)),
        "y": jnp.asarray(rng.integers(0, 5, size=(b,)).astype(np.int32)),
        "cond_img": jnp.asarray(rng.normal(size=(b, s, s, 1)).astype(np.float32)),
        "lsm_cond": jnp.asarray(rng.normal(size=(b, s, s, 2)).astype(np.float32)),
        "topo_cond": jnp.asarray(rng.normal(size=(b, s, s, 2)).astype(np.float32)),
        "sdf": jnp.asarray(rng.uniform(size=(b, s, s, 1)).astype(np.float32)),
    }


def tiny_model():
    spec = ModelSpec(
        in_channels=5, time_embedding=32, last_fmap_channels=64, num_heads=2,
        block_layers=(1, 1, 1, 1), num_classes=4,
    )
    return build_score_model(spec, VESDE())


@pytest.fixture(scope="module")
def tiny_state(synth_env, tiny_batch):
    cfg = tiny_config(synth_env)
    model = tiny_model()
    init = {k: v for k, v in tiny_batch.items() if k != "sdf"}
    state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
    return cfg, model, state


class TestState:
    def test_xavier_init_applied(self, tiny_state):
        _, model, state = tiny_state
        # conv biases should be 0.01 (resize-conv decoder convs have biases)
        leaf = state.params["decoder"]["block0"]["conv_up"]["bias"]
        np.testing.assert_allclose(np.asarray(leaf), 0.01)

    def test_learning_rate_injection(self, tiny_state):
        _, _, state = tiny_state
        assert state.learning_rate == pytest.approx(1e-3)
        state2 = state.with_learning_rate(5e-4)
        assert state2.learning_rate == pytest.approx(5e-4)

    def test_ema_updates(self, tiny_state, tiny_batch):
        cfg, model, state = tiny_state
        step = jax.jit(make_train_step(model, VESDE()))
        new_state, _ = step(state, tiny_batch, jax.random.PRNGKey(1))
        # EMA moved slightly toward new params, but not equal to them
        p = np.asarray(jax.tree.leaves(new_state.params)[0])
        e = np.asarray(jax.tree.leaves(new_state.ema_params)[0])
        o = np.asarray(jax.tree.leaves(state.params)[0])
        assert not np.allclose(p, o)  # params moved
        assert not np.allclose(e, p)  # ema lags params
        assert np.abs(e - o).max() < np.abs(p - o).max()  # ema closer to old


class TestTrainStep:
    def test_loss_decreases(self, tiny_state, tiny_batch):
        cfg, model, state = tiny_state
        step = jax.jit(make_train_step(model, VESDE()))
        rng = jax.random.PRNGKey(0)
        first = last = None
        for i in range(30):
            rng, k = jax.random.split(rng)
            state, m = step(state, tiny_batch, k)
            if i == 0:
                first = float(m["loss"])
            last = float(m["loss"])
        assert last < first

    def test_eval_step_no_mutation(self, tiny_state, tiny_batch):
        cfg, model, state = tiny_state
        estep = jax.jit(make_eval_step(model, VESDE()))
        m = estep(state, tiny_batch, jax.random.PRNGKey(0))
        assert np.isfinite(float(m["loss"]))

    def test_detect_anomaly_flags_nan(self, tiny_state, tiny_batch):
        cfg, model, state = tiny_state
        step = jax.jit(make_train_step(model, VESDE(), detect_anomaly=True))
        bad = dict(tiny_batch)
        bad["x"] = tiny_batch["x"].at[0, 0, 0, 0].set(jnp.nan)
        _, m = step(state, bad, jax.random.PRNGKey(0))
        assert not bool(m["finite"])
        _, m2 = step(state, tiny_batch, jax.random.PRNGKey(0))
        assert bool(m2["finite"])


class TestSchedulers:
    def test_step_lr(self):
        s = StepLR(1.0, step_size=2, gamma=0.1)
        lrs = [s.step() for _ in range(4)]
        assert lrs == pytest.approx([1.0, 0.1, 0.1, 0.01])

    def test_cosine(self):
        s = CosineAnnealingLR(1.0, t_max=10, eta_min=0.0)
        lrs = [s.step() for _ in range(10)]
        assert lrs[-1] == pytest.approx(0.0, abs=1e-6)
        assert all(a >= b for a, b in zip(lrs, lrs[1:]))

    def test_plateau(self):
        s = ReduceLROnPlateau(1.0, factor=0.5, patience=1, threshold=0.0, min_lr=0.1)
        assert s.step(1.0) == 1.0      # first: sets best
        assert s.step(1.0) == 1.0      # bad 1 (<= patience)
        assert s.step(1.0) == 0.5      # bad 2 -> reduce
        assert s.step(0.5) == 0.5      # improvement
        assert s.step(0.9) == 0.5
        assert s.step(0.9) == 0.25

    def test_early_stopping(self):
        es = EarlyStopping(patience=2, min_delta=0.0)
        assert not es.update(1.0)
        assert not es.update(1.1)
        assert es.update(1.2)

    def test_factory(self, synth_env):
        cfg = tiny_config(synth_env)
        cfg.training.lr_scheduler = "ReduceLROnPlateau"
        assert isinstance(make_scheduler(cfg), ReduceLROnPlateau)


class TestCheckpointing:
    def test_round_trip(self, tiny_state, tiny_batch, tmp_path):
        cfg, model, state = tiny_state
        step = jax.jit(make_train_step(model, VESDE()))
        state, _ = step(state, tiny_batch, jax.random.PRNGKey(0))
        mngr = CheckpointManager(str(tmp_path / "ckpt"))
        mngr.save(int(state.step), state, {"val_loss": 1.23, "epoch": 5})

        fresh = create_train_state(
            cfg, model, {k: v for k, v in tiny_batch.items() if k != "sdf"},
            jax.random.PRNGKey(42),
        )
        restored, meta = mngr.restore(fresh)
        assert meta["epoch"] == 5
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(
            jax.tree.leaves(restored.opt_state), jax.tree.leaves(state.opt_state)
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.step) == int(state.step)
        mngr.close()

    def test_best_tracking(self, tiny_state, tiny_batch, tmp_path):
        cfg, model, state = tiny_state
        mngr = CheckpointManager(str(tmp_path / "ckpt2"))
        mngr.save(1, state, {"val_loss": 5.0})
        state2 = state.replace(step=state.step + 1)
        mngr.save(2, state2, {"val_loss": 3.0})
        state3 = state.replace(step=state.step + 2)
        mngr.save(3, state3, {"val_loss": 4.0})
        assert mngr.best_step() == 2
        assert mngr.latest_step() == 3
        mngr.close()


class TestAsyncCheckpointing:
    """Non-blocking saves (training/checkpointing.py): the device-side
    snapshot must make the save immune to the train step's buffer donation,
    and accessors must serialize behind in-flight saves."""

    def test_survives_donation_of_source_buffers(self, tiny_state, tiny_batch, tmp_path):
        cfg, model, _ = tiny_state
        # fresh state: this test DONATES its buffers, and tiny_state is a
        # module-scoped fixture shared with later tests
        state = create_train_state(
            cfg, model, {k: v for k, v in tiny_batch.items() if k != "sdf"},
            jax.random.PRNGKey(7),
        )
        step = jax.jit(make_train_step(model, VESDE()), donate_argnums=0)
        state, _ = step(state, tiny_batch, jax.random.PRNGKey(0))
        saved_params = jax.tree.map(np.asarray, state.params)
        mngr = CheckpointManager(str(tmp_path / "ckpt_async"))
        mngr.save(int(state.step), state, {"val_loss": 1.0, "epoch": 1}, block=False)
        # donate the very buffers the save references — the next step
        # invalidates them exactly as the training loop would
        state, _ = step(state, tiny_batch, jax.random.PRNGKey(1))
        mngr.wait()

        fresh = create_train_state(
            cfg, model, {k: v for k, v in tiny_batch.items() if k != "sdf"},
            jax.random.PRNGKey(42),
        )
        restored, meta = mngr.restore(fresh)
        assert meta["epoch"] == 1
        for a, b in zip(jax.tree.leaves(restored.params), jax.tree.leaves(saved_params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        mngr.close()

    def test_accessors_wait_for_inflight_save(self, tiny_state, tmp_path):
        _, _, state = tiny_state
        mngr = CheckpointManager(str(tmp_path / "ckpt_async2"))
        mngr.save(7, state, {"val_loss": 2.0}, block=False)
        assert mngr.latest_step() == 7  # implies the save committed
        mngr.save(8, state, {"val_loss": 1.0}, block=False)
        assert mngr.best_step() == 8
        mngr.close()

    def test_worker_failure_surfaces_on_wait(self, tiny_state, tmp_path, monkeypatch):
        _, _, state = tiny_state
        mngr = CheckpointManager(str(tmp_path / "ckpt_async3"))

        def boom(step, tree, meta):
            raise RuntimeError("disk full")

        monkeypatch.setattr(mngr, "_save_tree", boom)
        mngr.save(1, state, {"val_loss": 1.0}, block=False)
        with pytest.raises(RuntimeError, match="disk full"):
            mngr.wait()
        mngr.wait()  # failure is not re-raised twice; manager stays usable
        mngr.close()


class TestPipeline:
    def test_end_to_end_smoke(self, synth_env):
        cfg = tiny_config(synth_env)
        train_loader, valid_loader, _ = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, valid_loader)
        history = pipe.train(epochs=2, steps_per_epoch=3)
        assert len(history["train_loss"]) == 2
        assert all(np.isfinite(v) for v in history["train_loss"])
        # best-val checkpoint written
        assert pipe.checkpoints.latest_step() is not None
        # losses dumped
        assert os.path.exists(
            os.path.join(cfg.paths.sample_dir, f"losses_{pipe.model_string}.json")
        )

    def test_resume(self, synth_env, tmp_path):
        cfg = tiny_config(synth_env)
        # own checkpoint dir — the smoke test writes under the same model string
        cfg.paths.checkpoint_dir = str(tmp_path / "ckpt_resume")
        train_loader, valid_loader, _ = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, valid_loader)
        pipe.train(epochs=1, steps_per_epoch=2)
        step_before = int(pipe.state.step)

        pipe2 = TrainingPipeline(cfg, train_loader, valid_loader)
        pipe2.load()
        assert int(pipe2.state.step) == step_before
        assert pipe2.epoch >= 1

    def test_checkpoint_interval_gates_saves(self, synth_env, tmp_path, monkeypatch):
        """checkpoint_min_interval_epochs rate-limits best-val WRITES;
        rate-limited improvements are held as device snapshots and flushed at
        the next eligible epoch or loop exit (remote-device tunnels pay
        ~15-30 s of full-state transfer per write)."""
        cfg = tiny_config(synth_env)
        cfg.paths.checkpoint_dir = str(tmp_path / "ckpt_gated")
        cfg.training.checkpoint_min_interval_epochs = 3
        train_loader, valid_loader, _ = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, valid_loader)
        saved_epochs, flushed_epochs = [], []
        monkeypatch.setattr(
            pipe, "save", lambda val: saved_epochs.append(pipe.epoch)
        )
        monkeypatch.setattr(
            pipe, "_flush_pending",
            lambda pending: flushed_epochs.append(pending[2]["epoch"]),
        )
        # force strictly improving val so every epoch WANTS to save
        monkeypatch.setattr(
            pipe, "validate_batches", lambda max_steps=None: 100.0 - pipe.epoch
        )
        pipe.train(epochs=5, steps_per_epoch=1)
        # epoch counter is post-increment at save time: improvements at
        # epochs 1..5 -> live writes at 1 and 4; the epoch-5 improvement is
        # rate-limited and flushed at loop exit
        assert saved_epochs == [1, 4]
        assert flushed_epochs == [5]

    def test_rate_limited_best_is_never_lost(self, synth_env, tmp_path, monkeypatch):
        """A best-val improvement inside the rate-limit window must survive
        even when val later worsens: the snapshot from the improvement epoch
        is flushed, so restore(best=True) returns THOSE weights/meta."""
        cfg = tiny_config(synth_env)
        cfg.paths.checkpoint_dir = str(tmp_path / "ckpt_pending")
        cfg.training.checkpoint_min_interval_epochs = 3
        train_loader, valid_loader, _ = make_loaders(cfg)
        pipe = TrainingPipeline(cfg, train_loader, valid_loader)
        vals = iter([10.0, 2.0, 8.0, 9.0])
        monkeypatch.setattr(
            pipe, "validate_batches", lambda max_steps=None: next(vals)
        )
        pipe.train(epochs=4, steps_per_epoch=1)
        # e1 val 10 saved; e2 val 2 rate-limited -> pending; e3/e4 worsen;
        # the pending epoch-2 snapshot is flushed at the first eligible epoch
        pipe2 = TrainingPipeline(cfg, train_loader, valid_loader)
        pipe2.load(best=True)
        assert pipe2.epoch == 2
        assert min(pipe2.history["val_loss"]) == pytest.approx(2.0)

    def test_model_spec_from_config(self, synth_env):
        cfg = tiny_config(synth_env)
        spec = model_spec_from_config(cfg)
        assert spec.in_channels == 1 + 4  # 1 LR + 2*2 geo
        assert spec.num_classes == 4


class TestElasticRecovery:
    def test_nonfinite_update_skipped(self, tiny_state, tiny_batch):
        cfg, model, state = tiny_state
        step = jax.jit(
            make_train_step(model, VESDE(), skip_nonfinite_updates=True)
        )
        bad = dict(tiny_batch)
        bad["x"] = tiny_batch["x"].at[0, 0, 0, 0].set(jnp.nan)
        new_state, m = step(state, bad, jax.random.PRNGKey(0))
        assert not bool(m["finite"])
        # state untouched, including the step counter
        assert int(new_state.step) == int(state.step)
        for a, b in zip(jax.tree.leaves(new_state.params), jax.tree.leaves(state.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        # a clean batch still updates
        ok_state, m2 = step(state, tiny_batch, jax.random.PRNGKey(0))
        assert bool(m2["finite"]) and int(ok_state.step) == int(state.step) + 1
