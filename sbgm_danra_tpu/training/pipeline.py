"""Epoch-level training engine.

The analogue of the reference's TrainingPipeline_general (sbgm/training.py:35-822)
with its dead code paths made functional:

- working EMA (reference declares but never updates it, training.py:111-117);
- LR schedulers that actually step on validation loss;
- early stopping (configured but unused in the reference);
- full-state Orbax checkpoints (best-val and latest) with exact resume,
  including optimizer/EMA/scheduler/early-stop state;
- extreme-precipitation sentinel on back-transformed fields every
  ``monitor_every`` steps (reference training.py:358-398);
- in-graph anomaly flags instead of torch.autograd.detect_anomaly.

Device placement: batches stream through ``device_prefetch`` (double-buffered
host->HBM). With a mesh (cfg.parallel.mesh_shape) the step functions come from
``sbgm_danra_tpu.parallel`` and batches are scattered over the data axis.
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sbgm_danra_tpu.config import Config
from sbgm_danra_tpu.data.loader import DataLoader, device_prefetch, extract_batch
from sbgm_danra_tpu.models.unet import ModelSpec, build_score_model
from sbgm_danra_tpu.sde import VESDE
from sbgm_danra_tpu.training.checkpointing import CheckpointManager, snapshot_state
from sbgm_danra_tpu.training.schedulers import EarlyStopping, make_scheduler
from sbgm_danra_tpu.training.state import TrainState, create_train_state
from sbgm_danra_tpu.training.train_step import make_eval_step, make_score_fn, make_train_step
from sbgm_danra_tpu.utils.naming import get_model_string
from sbgm_danra_tpu.utils.sentinels import report_precip_extremes

logger = logging.getLogger(__name__)


def model_spec_from_config(cfg: Config) -> ModelSpec:
    """Config -> ModelSpec (reference get_model, training_utils.py:597-669)."""
    return ModelSpec(
        in_channels=cfg.in_channels(),
        output_channels=1,
        time_embedding=cfg.sampler.time_embedding,
        last_fmap_channels=cfg.sampler.last_fmap_channels,
        num_heads=cfg.sampler.num_heads,
        block_layers=tuple(cfg.sampler.block_layers),
        num_classes=cfg.num_classes(),
        use_resize_conv=cfg.model.use_resize_conv,
        decoder_norm=cfg.model.decoder_norm,
        decoder_gn_groups=cfg.model.decoder_gn_groups,
        decoder_activation=cfg.model.decoder_activation,
        attention_backend=cfg.model.attention_backend,
        compute_dtype=cfg.model.compute_dtype,
    )


class TrainingPipeline:
    """Owns model/state/steps and runs the epoch loop."""

    def __init__(
        self,
        cfg: Config,
        train_loader: DataLoader,
        valid_loader: Optional[DataLoader] = None,
        back_transforms: Optional[Dict] = None,
        mesh: Optional[jax.sharding.Mesh] = None,
        gen_loader: Optional[DataLoader] = None,
    ):
        self.cfg = cfg
        self.train_loader = train_loader
        self.valid_loader = valid_loader
        self.back_transforms = back_transforms or {}
        self.sde = VESDE()
        self.model = build_score_model(model_spec_from_config(cfg), self.sde)
        self.model_string = get_model_string(cfg)
        self.rng = jax.random.PRNGKey(cfg.training.seed)

        # state init from one sample batch
        self.rng, init_rng = jax.random.split(self.rng)
        logger.info("drawing first batch (compiles the device batch sampler)...")
        first = next(iter(train_loader))
        jax.block_until_ready(first)
        sample = (
            first
            if getattr(train_loader, "is_device_loader", False)
            else extract_batch(first, cfg.highres.variable)
        )
        self._init_kwargs = {
            k: jnp.asarray(v)
            for k, v in sample.items()
            if k in ("x", "y", "cond_img", "lsm_cond", "topo_cond")
        }
        logger.info("initializing train state (model init compile)...")
        self.state = create_train_state(cfg, self.model, self._init_kwargs, init_rng)
        jax.block_until_ready(self.state.params)
        logger.info("train state initialized")

        self.mesh = mesh
        self.batch_sharding = None
        if mesh is not None:
            from sbgm_danra_tpu.parallel.train import make_parallel_steps

            self._train_step, self._eval_step, self.state, self.batch_sharding = (
                make_parallel_steps(
                    self.model, self.sde, cfg, self.state, mesh,
                )
            )
        else:
            # donate the incoming state: the step returns the new one, so the
            # old params/opt/EMA buffers are reused in place (halves peak HBM
            # for the state tree)
            self._train_step = jax.jit(
                make_train_step(
                    self.model,
                    self.sde,
                    t_eps=cfg.sampler.t_eps,
                    use_sdf_weights=cfg.training.sdf_weighted_loss,
                    detect_anomaly=cfg.training.detect_anomaly,
                    remat=cfg.training.remat,
                    skip_nonfinite_updates=cfg.training.skip_nonfinite_updates,
                ),
                donate_argnums=0,
            )
            self._eval_step = jax.jit(
                make_eval_step(
                    self.model,
                    self.sde,
                    t_eps=cfg.sampler.t_eps,
                    use_sdf_weights=cfg.training.sdf_weighted_loss,
                )
            )

        # Fused sample+train scan (training/fused.py): K steps per dispatch,
        # amortizing the remote-tunnel dispatch tax and freeing the host core
        # for windowed staging. Requires a device-resident loader (the
        # sampler must be invocable inside the scan body).
        self._fused_step = None
        self._fused_k = 1
        if cfg.training.fused_steps > 0:
            if not hasattr(train_loader, "sample_raw"):
                raise ValueError(
                    "training.fused_steps requires a device-resident train "
                    "loader (data_handling.device_dataset: true)"
                )
            if mesh is not None:
                raise ValueError(
                    "training.fused_steps is a single-device path; mesh "
                    "training already amortizes dispatch via parallel steps"
                )
            if cfg.training.monitor_extremes:
                logger.warning(
                    "fused_steps > 0: extreme-value monitoring is skipped "
                    "(batches never materialize on host)"
                )
            from sbgm_danra_tpu.training.fused import make_fused_train_step

            self._fused_k = cfg.training.fused_steps
            self._fused_step = make_fused_train_step(
                self.model,
                self.sde,
                train_loader.sample_raw,
                t_eps=cfg.sampler.t_eps,
                use_sdf_weights=cfg.training.sdf_weighted_loss,
                remat=cfg.training.remat,
                skip_nonfinite_updates=cfg.training.skip_nonfinite_updates,
                track_finite=cfg.training.detect_anomaly,
            )

        self.scheduler = make_scheduler(cfg)
        es = cfg.training.early_stopping_params
        self.early_stopping = (
            EarlyStopping(es.patience, es.min_delta) if cfg.training.early_stopping else None
        )
        ckpt_dir = os.path.join(cfg.paths.checkpoint_dir, self.model_string)
        self.checkpoints = CheckpointManager(ckpt_dir)
        self.history: Dict[str, List[float]] = {"train_loss": [], "val_loss": [], "lr": []}
        self.epoch = 0
        self.gen_loader = gen_loader

    # -- epoch internals ------------------------------------------------------

    def _batches(self, loader: DataLoader) -> Iterable[Dict]:
        if getattr(loader, "is_device_loader", False):
            # batches are already device-resident model kwargs; no extract,
            # no host prefetch (there is no host->device copy to hide)
            yield from loader
            return
        raw = (extract_batch(b, self.cfg.highres.variable) for b in loader)
        if self.mesh is not None:
            n_dev = self.mesh.devices.size

            def divisible(batches):
                for b in batches:
                    if b["x"].shape[0] % n_dev:
                        # ragged tail (valid loader keeps partial batches);
                        # a non-divisible batch cannot shard over the mesh
                        logger.debug(
                            "dropping ragged batch of %d (mesh size %d)",
                            b["x"].shape[0], n_dev,
                        )
                        continue
                    yield b

            raw = divisible(raw)
        yield from device_prefetch(
            raw, depth=self.cfg.data_handling.prefetch_depth, sharding=self.batch_sharding
        )

    def train_batches(self, max_steps: Optional[int] = None) -> float:
        """One epoch of optimization (reference train_batches, training.py:246-422)."""
        from sbgm_danra_tpu.utils.profiling import StepTimer, trace

        cfg = self.cfg
        losses = []
        monitor_every = 50
        timer = StepTimer()
        profile_dir = cfg.training.profile_dir if self.epoch == 0 else ""
        with trace(profile_dir):
            self._run_train_batches(max_steps, losses, timer, monitor_every)
        if timer.steps_per_sec > 0:
            # fused mode ticks once per K-step chunk; scale back to steps
            logger.info(
                "epoch %d throughput: %.2f steps/s (%.1f samples/s)",
                self.epoch, timer.steps_per_sec * self._fused_k,
                timer.items_per_sec(cfg.training.batch_size * self._fused_k),
            )
        if not losses:
            return float("nan")
        return float(jnp.mean(jnp.stack(losses)))

    def _run_train_fused(self, max_steps, losses, timer) -> None:
        """K steps per dispatch via iter_chunks + the fused scan. The chunk's
        loss trace is fetched per chunk — the host-side drain that throttles
        emission to device speed (iter_chunks backpressure contract) and
        feeds the same per-step loss history as the eager path."""
        cfg = self.cfg
        k = self._fused_k
        n_chunks = -(-max_steps // k) if max_steps else None
        for ci, (buffers, batch_keys) in enumerate(
            self.train_loader.iter_chunks(k, n_chunks)
        ):
            timer.tick()
            # step keys by sequential split — the exact eager-loop stream
            sks = []
            for _ in range(k):
                self.rng, sk = jax.random.split(self.rng)
                sks.append(sk)
            if ci == 0 and self.epoch == 0:
                logger.info("first fused chunk (compiles %d-step scan)...", k)
            self.state, traces = self._fused_step(
                self.state, batch_keys, jnp.stack(sks), *buffers
            )
            trace = np.asarray(traces["loss"])  # fetch-by-value: drains
            if ci == 0 and self.epoch == 0:
                logger.info("first fused chunk done (loss %.4f)", trace[-1])
            if cfg.training.detect_anomaly and "finite" in traces:
                finite = np.asarray(traces["finite"])
                if not finite.all():
                    raise FloatingPointError(
                        f"Non-finite loss/gradients in fused chunk {ci} "
                        f"(step offsets {np.flatnonzero(~finite).tolist()})"
                    )
            losses.extend(np.float32(v) for v in trace)

    def _run_train_batches(self, max_steps, losses, timer, monitor_every) -> None:
        cfg = self.cfg
        if self._fused_step is not None:
            self._run_train_fused(max_steps, losses, timer)
            return
        for i, batch in enumerate(self._batches(self.train_loader)):
            if max_steps is not None and i >= max_steps:
                break
            timer.tick()
            self.rng, step_rng = jax.random.split(self.rng)
            if i == 0 and self.epoch == 0:
                logger.info("first train step (compiles fwd+bwd)...")
            self.state, metrics = self._train_step(self.state, batch, step_rng)
            if i == 0 and self.epoch == 0:
                jax.block_until_ready(metrics["loss"])
                logger.info("first train step done (loss %.4f)", float(metrics["loss"]))
            if cfg.training.detect_anomaly and "finite" in metrics:
                if not bool(metrics["finite"]):
                    raise FloatingPointError(
                        f"Non-finite loss/gradients at step {int(self.state.step)}"
                    )
            losses.append(metrics["loss"])
            if (
                cfg.training.monitor_extremes
                and cfg.highres.variable == "prcp"
                and i % monitor_every == 0
                and "generated" in self.back_transforms
            ):
                hr_bt = np.asarray(self.back_transforms["generated"](batch["x"]))
                report_precip_extremes(hr_bt, "train-HR", cfg.training.extreme_cap)

    def validate_batches(self, max_steps: Optional[int] = None) -> float:
        if self.valid_loader is None:
            return float("nan")
        losses = []
        for i, batch in enumerate(self._batches(self.valid_loader)):
            if max_steps is not None and i >= max_steps:
                break
            self.rng, step_rng = jax.random.split(self.rng)
            losses.append(self._eval_step(self.state, batch, step_rng)["loss"])
        return float(jnp.mean(jnp.stack(losses))) if losses else float("nan")

    # -- persistence ----------------------------------------------------------

    def _meta(self, val_loss: float) -> Dict:
        return {
            "epoch": self.epoch,
            "val_loss": val_loss,
            "history": self.history,
            "scheduler": self.scheduler.state_dict(),
            "early_stopping": self.early_stopping.state_dict()
            if self.early_stopping
            else None,
            "model_string": self.model_string,
        }

    def save(self, val_loss: float) -> None:
        self.checkpoints.save(
            int(self.state.step),
            self.state,
            self._meta(val_loss),
            block=not self.cfg.training.async_checkpointing,
        )

    def _frozen_meta(self, val_loss: float) -> Dict:
        """Meta captured NOW (deep-copied history): a deferred save must
        record the improvement's epoch, not the flush-time state."""
        meta = self._meta(val_loss)
        meta["history"] = {k: list(v) for k, v in self.history.items()}
        return meta

    def _flush_pending(self, pending: tuple) -> None:
        step, state, meta = pending
        logger.info(
            "flushing rate-limited best checkpoint (epoch %d, val %.4f)",
            meta["epoch"], meta["val_loss"],
        )
        self.checkpoints.save(
            step, state, meta, block=not self.cfg.training.async_checkpointing
        )

    def load(self, best: bool = False) -> None:
        self.state, meta = self.checkpoints.restore(self.state, best=best)
        self.epoch = meta.get("epoch", 0)
        self.history = meta.get("history", self.history)
        if meta.get("scheduler"):
            self.scheduler.load_state_dict(meta["scheduler"])
            self.state = self.state.with_learning_rate(self.scheduler.lr)
        if self.early_stopping and meta.get("early_stopping"):
            self.early_stopping.load_state_dict(meta["early_stopping"])

    # -- main loop -------------------------------------------------------------

    def train(
        self,
        epochs: Optional[int] = None,
        steps_per_epoch: Optional[int] = None,
        on_epoch_end: Optional[Callable[["TrainingPipeline", int, float, float], None]] = None,
    ) -> Dict[str, List[float]]:
        cfg = self.cfg
        epochs = epochs or cfg.training.epochs
        steps_per_epoch = steps_per_epoch or cfg.training.steps_per_epoch
        best_val = min(self.history["val_loss"], default=float("inf"))
        save_interval = max(1, cfg.training.checkpoint_min_interval_epochs)
        last_save_epoch = -save_interval  # first improvement always saves
        pending = None  # rate-limited best: (step, state snapshot, meta)
        for ep_i in range(epochs):
            t0 = time.time()
            self.train_loader.set_epoch(self.epoch)
            train_loss = self.train_batches(steps_per_epoch)
            val_loss = self.validate_batches(steps_per_epoch)
            self.history["train_loss"].append(train_loss)
            self.history["val_loss"].append(val_loss)
            self.history["lr"].append(self.scheduler.lr)
            dt = time.time() - t0
            logger.info(
                "epoch %d: train %.4f  val %.4f  lr %.2e  (%.1fs)",
                self.epoch, train_loss, val_loss, self.scheduler.lr, dt,
            )

            monitored = val_loss if np.isfinite(val_loss) else train_loss
            self.epoch += 1  # epochs completed; recorded in checkpoint meta
            # best-val checkpointing (reference training.py:477-482), rate-
            # limited by checkpoint_min_interval_epochs. A rate-limited
            # improvement is DEFERRED, never lost: its weights are held as a
            # device-side snapshot (fresh buffers, immune to the train step's
            # donation) and flushed at the next eligible epoch or at loop
            # exit — including an early-stopping break.
            eligible = self.epoch - last_save_epoch >= save_interval
            if monitored < best_val:
                best_val = monitored
                if eligible:
                    self.save(monitored)
                    last_save_epoch = self.epoch
                    pending = None
                else:
                    pending = (
                        int(self.state.step),
                        snapshot_state(self.state),
                        self._frozen_meta(monitored),
                    )
            elif pending is not None and eligible:
                self._flush_pending(pending)
                last_save_epoch = self.epoch
                pending = None

            new_lr = self.scheduler.step(monitored)
            self.state = self.state.with_learning_rate(new_lr)
            every = cfg.visualization.preview_every
            if every and self.epoch % every == 0:
                self.generate_previews()
            if on_epoch_end is not None:
                on_epoch_end(self, self.epoch, train_loss, val_loss)
            if self.early_stopping is not None and self.early_stopping.update(monitored):
                logger.info("early stopping at epoch %d", self.epoch)
                break

        if pending is not None:
            # improvements still held past the last eligible epoch (tail
            # window or early-stopping break) are written now
            self._flush_pending(pending)
        # Train returns with every checkpoint durable on disk: callers (eval
        # scripts, resume) read the checkpoint directory right after.
        self.checkpoints.wait()
        self._dump_history()
        return self.history

    def _dump_history(self) -> None:
        path = os.path.join(
            self.cfg.paths.sample_dir, f"losses_{self.model_string}.json"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.history, f)

    # -- sampling hooks ----------------------------------------------------------

    def score_fn(self, use_ema: Optional[bool] = None, image_hw: Optional[tuple] = None):
        """Sampling closure over the (EMA) weights.

        ``image_hw``: the inference image size, if known — applies the
        measured per-shape lowering winners (models/unet.py inference_spec):
        identical params and outputs, but e.g. the fused linear head is -16%
        wall at full-domain scale. None keeps the training-time program.
        """
        use_ema = self.cfg.training.with_ema if use_ema is None else use_ema
        model = self.model
        if image_hw is not None:
            from sbgm_danra_tpu.models.unet import build_score_model, inference_spec

            spec = inference_spec(model_spec_from_config(self.cfg), image_hw)
            model = build_score_model(spec, self.sde)
        return make_score_fn(model, self.state, use_ema=use_ema)

    def generate_previews(self, n_steps: Optional[int] = None) -> Optional[np.ndarray]:
        """Per-epoch preview sampling (reference generate_and_plot_samples,
        training.py:611-786): sample a small gen batch with the configured
        sampler and current (EMA) weights, clamp extreme precip, save a figure.

        Unlike the reference (which reloads the best checkpoint from disk each
        epoch), this samples the live EMA state — no IO round-trip.
        """
        if self.gen_loader is None:
            return None
        from sbgm_danra_tpu.sampling.samplers import SamplerConfig, get_sampler
        from sbgm_danra_tpu.utils.sentinels import clamp_extremes, report_precip_extremes

        cfg = self.cfg
        batch = extract_batch(next(iter(self.gen_loader)), cfg.highres.variable)
        cond = {
            k: jnp.asarray(batch[k])
            for k in ("y", "cond_img", "lsm_cond", "topo_cond")
            if batch.get(k) is not None
        }
        n = batch["x"].shape[0]
        h, w = batch["x"].shape[1:3]
        g = cfg.classifier_free_guidance
        sampler_cfg = SamplerConfig(
            num_steps=n_steps or min(cfg.sampler.n_timesteps, 200),
            snr=cfg.sampler.snr,
            eps=cfg.sampler.t_eps,
            guidance_scale=g.guidance_scale if g.enabled else None,
            guidance_scale_max=g.guidance_scale_max,
            edm_rho=cfg.sampler.edm_rho,
            s_churn=cfg.sampler.s_churn,
        )
        sampler = get_sampler(cfg.sampler.sampler_type)
        self.rng, key = jax.random.split(self.rng)
        generated = np.asarray(
            sampler(self.score_fn(), key, (n, h, w, 1), self.sde, sampler_cfg, cond=cond)
        )[..., 0]
        if cfg.highres.variable == "prcp" and "generated" in self.back_transforms:
            gen_bt = np.asarray(self.back_transforms["generated"](generated))
            report_precip_extremes(gen_bt, f"epoch{self.epoch}-preview", cfg.training.extreme_cap)
            generated = np.asarray(clamp_extremes(generated, generated.max()))
        if cfg.visualization.save_figs:
            try:
                from sbgm_danra_tpu.utils.plotting import plot_samples_and_generated

                fig = plot_samples_and_generated(batch, generated, cfg)
                out = os.path.join(
                    cfg.paths.sample_dir,
                    f"preview_{self.model_string}_epoch{self.epoch}.png",
                )
                os.makedirs(os.path.dirname(out), exist_ok=True)
                fig.savefig(out, dpi=120)
                import matplotlib.pyplot as plt

                plt.close(fig)
            except Exception as e:  # previews must never kill training
                logger.warning("preview plotting failed: %s", e)
        return generated
