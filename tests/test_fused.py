"""Fused sample+train scan (training/fused.py): step-equivalence with the
eager loop, chunked loader protocol, strided window layout, pipeline
integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sbgm_danra_tpu.data.device_data import DeviceDataLoader
from sbgm_danra_tpu.data.factory import make_dataset
from sbgm_danra_tpu.data.windowed_data import WindowedDeviceLoader
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.training.fused import chunk_keys, make_fused_train_step
from sbgm_danra_tpu.training.state import create_train_state
from sbgm_danra_tpu.training.train_step import make_train_step

from tests.test_training import synth_env, tiny_config  # noqa: F401 (fixture)


K = 3  # chunk steps under test


def _copy(state):
    """Fresh buffers: the fused step donates its state argument."""
    return jax.tree.map(jnp.array, state)


def _delta_close(params_a, params_b, params_init, rtol=1e-3):
    """Norm-based update equivalence: ||Δa - Δb|| <= rtol * ||Δa|| with
    Δ = params - init, plus a moved-at-all guard. Per-element rtol on raw
    params would pass trivially at the tame test lr (updates are ~1e-4 of
    the params); per-element rtol on deltas fails spuriously on elements
    whose gradient happens to be ~0."""
    da = jnp.concatenate([
        (a - i).ravel()
        for a, i in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_init))
    ])
    db = jnp.concatenate([
        (b - i).ravel()
        for b, i in zip(jax.tree.leaves(params_b), jax.tree.leaves(params_init))
    ])
    na = float(jnp.linalg.norm(da))
    assert na > 0, "parameters did not move — the comparison is vacuous"
    diff = float(jnp.linalg.norm(da - db))
    assert diff <= rtol * na, f"update mismatch: ||Δa-Δb||/||Δa|| = {diff / na:.3g}"


@pytest.fixture(scope="module")
def fused_env(synth_env):  # noqa: F811
    cfg = tiny_config(synth_env)
    loader = DeviceDataLoader(
        make_dataset(cfg, "train"), batch_size=2, seed=0, cfg_dropout_prob=0.1
    )
    from sbgm_danra_tpu.models.unet import build_score_model
    from sbgm_danra_tpu.training.pipeline import model_spec_from_config

    sde = VESDE()
    model = build_score_model(model_spec_from_config(cfg), sde)
    first = loader.sample(jax.random.PRNGKey(0))
    init = {k: v for k, v in first.items()
            if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")}
    state = create_train_state(cfg, model, init, jax.random.PRNGKey(0))
    return cfg, loader, model, sde, state


class TestFusedParity:
    def test_fused_chunk_matches_eager_steps(self, fused_env, synth_env):  # noqa: F811
        """One fused K-step dispatch == K eager (sample, train_step) calls
        fed the identical key arrays: same batch/key streams, outputs
        equal up to XLA re-fusion tolerance (the scan body compiles as one
        program; op order within fusions may differ). SGD at lr=1e-6: the
        VESDE score loss is ~1e3 here and tiny_config's lr=1e-3 makes the
        SGD trajectory reach inf by step 2 — comparing chaos, not
        semantics. Adam is likewise avoided: its sign(grad)-scaled update
        amplifies near-zero-grad re-fusion noise to full ±lr flips.
        t_eps=0.5 keeps t away from the VESDE loss's sharp small-t region
        (1/sigma^2 weights): at t_eps=1e-3 the Hessian there amplifies the
        ~1e-5 per-step re-fusion noise to ~1e-2 over 3 steps (measured);
        at 0.5 the 3-step update mismatch is ~2e-4."""
        cfg, loader, model, sde, _ = fused_env
        cfg_sgd = tiny_config(synth_env)
        cfg_sgd.training.optimizer = "sgd"
        cfg_sgd.training.learning_rate = 1e-6
        t_eps = 0.5
        first = loader.sample(jax.random.PRNGKey(0))
        init = {k: v for k, v in first.items()
                if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")}
        state = create_train_state(cfg_sgd, model, init, jax.random.PRNGKey(0))
        step = jax.jit(make_train_step(model, sde, t_eps=t_eps, use_sdf_weights=True))
        base = jax.random.PRNGKey(7)
        batch_keys = chunk_keys(base, 0, K)
        step_keys = jax.random.split(jax.random.PRNGKey(8), K)

        eager = state
        eager_losses = []
        for i in range(K):
            batch = loader.sample_raw(batch_keys[i], *loader.buffers())
            eager, m = step(eager, batch, step_keys[i])
            eager_losses.append(float(m["loss"]))

        fused = make_fused_train_step(
            model, sde, loader.sample_raw, t_eps=t_eps, use_sdf_weights=True
        )
        fstate, traces = fused(_copy(state), batch_keys, step_keys, *loader.buffers())

        np.testing.assert_allclose(
            np.asarray(traces["loss"]), eager_losses, rtol=5e-4, atol=1e-5
        )
        _delta_close(eager.params, fstate.params, state.params)
        assert int(fstate.step) == int(state.step) + K

    def test_track_finite_flags(self, fused_env):
        cfg, loader, model, sde, state = fused_env
        fused = make_fused_train_step(
            model, sde, loader.sample_raw, use_sdf_weights=True, track_finite=True
        )
        _, traces = fused(
            _copy(state),
            chunk_keys(jax.random.PRNGKey(0), 0, K),
            jax.random.split(jax.random.PRNGKey(1), K),
            *loader.buffers(),
        )
        assert traces["finite"].shape == (K,)
        assert bool(np.asarray(traces["finite"]).all())


class TestChunkProtocol:
    def test_chunk_keys_match_iter_stream(self):
        base = jax.random.PRNGKey(3)
        keys = chunk_keys(base, 5, 4)
        for i in range(4):
            np.testing.assert_array_equal(
                np.asarray(keys[i]), np.asarray(jax.random.fold_in(base, 5 + i))
            )

    def test_device_loader_iter_chunks(self, fused_env):
        _, loader, *_ = fused_env
        chunks = list(loader.iter_chunks(2, n_chunks=3))
        assert len(chunks) == 3
        bufs, keys = chunks[0]
        assert len(bufs) == 5
        assert keys.shape[0] == 2

    def test_windowed_iter_chunks_fixed_mode(self, synth_env):  # noqa: F811
        cfg = tiny_config(synth_env)
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=2, window_days=6,
            window_steps=4, seed=0,
        )
        # fixed mode: ceil(4/2)=2 chunks per window, full schedule
        chunks = list(loader.iter_chunks(2))
        assert len(chunks) == 2 * loader.n_windows
        assert loader.n_swaps == loader.n_windows - 1

    def test_windowed_chunked_epoch_draws_eager_batch_keys(self, synth_env):  # noqa: F811
        """The chunked stream folds the same (epoch, global step) keys the
        eager iterator uses."""
        cfg = tiny_config(synth_env)
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=2, window_days=6,
            window_steps=4, seed=0,
        )
        base = jax.random.fold_in(jax.random.PRNGKey(loader.seed), loader.epoch)
        chunks = list(loader.iter_chunks(2))
        flat = jnp.concatenate([k for _, k in chunks])
        for i in range(int(flat.shape[0])):
            np.testing.assert_array_equal(
                np.asarray(flat[i]), np.asarray(jax.random.fold_in(base, i))
            )


class TestStridedLayout:
    def test_strided_windows_cover_archive(self, synth_env):  # noqa: F811
        cfg = tiny_config(synth_env)
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=2, window_days=6,
            seed=0, layout="strided",
        )
        seen = []
        for b in range(loader.n_windows):
            block = loader._block_dates(b)
            assert len(block) == loader.window_days
            seen.extend(block)
        assert set(seen) == set(loader.dates)

    def test_strided_window_spans_archive(self, synth_env):  # noqa: F811
        """A strided window's dates spread across the archive instead of
        being consecutive — the seasonal-decorrelation property."""
        cfg = tiny_config(synth_env)
        loader = WindowedDeviceLoader(
            make_dataset(cfg, "train"), batch_size=2, window_days=6,
            seed=0, layout="strided",
        )
        idx = [loader.dates.index(d) for d in loader._block_dates(0)]
        assert max(idx) - min(idx) > loader.window_days  # not consecutive
        diffs = np.diff(sorted(idx))
        assert (diffs == loader.n_windows).all()

    def test_bad_layout_rejected(self, synth_env):  # noqa: F811
        cfg = tiny_config(synth_env)
        with pytest.raises(ValueError, match="layout"):
            WindowedDeviceLoader(
                make_dataset(cfg, "train"), batch_size=2, window_days=6,
                layout="shuffled",
            )


class TestPipelineFused:
    def test_fused_pipeline_matches_eager(self, synth_env):  # noqa: F811
        """A fused-mode pipeline epoch optimizes to the same params as the
        eager device-loader epoch (same seeds, same key streams)."""
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline

        def run(fused_steps):
            cfg = tiny_config(synth_env)
            cfg.data_handling.device_dataset = True
            cfg.training.fused_steps = fused_steps
            # tame trajectory: see TestFusedParity docstring
            cfg.training.optimizer = "sgd"
            cfg.training.learning_rate = 1e-6
            cfg.sampler.t_eps = 0.5
            cfg.training.steps_per_epoch = 4
            cfg.training.epochs = 1
            train, valid, _ = make_loaders(cfg)
            pipe = TrainingPipeline(cfg, train, valid)
            init = jax.tree.map(jnp.array, pipe.state.params)
            hist = pipe.train(epochs=1, steps_per_epoch=4)
            return pipe, hist, init

        eager_pipe, eager_hist, init = run(0)
        fused_pipe, fused_hist, _ = run(2)
        assert int(fused_pipe.state.step) == int(eager_pipe.state.step) == 4
        np.testing.assert_allclose(
            fused_hist["train_loss"], eager_hist["train_loss"],
            rtol=5e-4, atol=1e-5,
        )
        _delta_close(eager_pipe.state.params, fused_pipe.state.params, init)

    def test_fused_requires_device_loader(self, synth_env):  # noqa: F811
        from sbgm_danra_tpu.data.factory import make_loaders
        from sbgm_danra_tpu.training.pipeline import TrainingPipeline

        cfg = tiny_config(synth_env)
        cfg.training.fused_steps = 2
        train, valid, _ = make_loaders(cfg)  # host loader
        with pytest.raises(ValueError, match="device-resident"):
            TrainingPipeline(cfg, train, valid)
