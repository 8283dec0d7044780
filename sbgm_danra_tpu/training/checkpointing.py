"""Orbax checkpointing: params + optimizer + EMA + step, best-val and latest.

The reference saves only {network_params, optimizer_params} torch state dicts on
best validation loss and restores only the model weights (training.py:203-244,
optimizer state saved but never restored; EMA never saved). Here the FULL
training state round-trips — params, BN stats, fixed buffers, optimizer state
(including the injected learning rate), EMA params, step — plus host-side
metadata (epoch, losses, scheduler/early-stop state, frozen config), so runs
resume exactly.
"""

from __future__ import annotations

import concurrent.futures
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import orbax.checkpoint as ocp

from sbgm_danra_tpu.training.state import TrainState


def _state_tree(state: TrainState) -> Dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "buffers": state.buffers,
        "opt_state": state.opt_state,
        "ema_params": state.ema_params,
    }


# Device-side snapshot of a state tree: one compiled dispatch that copies every
# leaf into fresh HBM buffers (shardings preserved — jit keeps input layouts
# for an elementwise copy). Needed because the train step DONATES the state
# (pipeline.py donate_argnums=0): the live buffers are invalidated by the next
# step, so a background device->host pull of them would race. The snapshot is
# never donated, so a worker thread can stream it to disk while training runs.
_snapshot = jax.jit(lambda tree: jax.tree.map(jnp.copy, tree))


def snapshot_state(state):
    """Device-side copy of a state pytree into fresh (never-donated) buffers.

    Use to hold weights past future train steps (which donate and invalidate
    the live buffers) — e.g. a rate-limited best-val improvement that will be
    written to disk later. One compiled dispatch; costs one extra state copy
    of HBM until released."""
    return _snapshot(state)


class CheckpointManager:
    """Keeps the latest checkpoints and tracks the best validation loss.

    `save(..., block=False)` hides the checkpoint cost from the training loop:
    the measured full-state save of the 19M-param flagship is 803 MB and
    14-33 s of device->host + disk time over the remote-TPU tunnel
    (BASELINE.md calibration experiment) — blocking, it stalls the chip for
    whole epochs' worth of steps. Non-blocking saves snapshot the state on
    DEVICE (one cheap dispatch) and hand the D2H pull + Orbax write to a
    single worker thread; `jax.device_get` releases the GIL during transfers,
    so the main thread keeps dispatching train steps. At most one save is in
    flight (a second request waits for the first), bounding transient HBM at
    one extra state copy. The reference has no analogue: it torch.save()s
    inline on the main thread (sbgm/training.py:477-482).
    """

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mngr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=max_to_keep,
                best_fn=lambda m: m.get("val_loss", float("inf")),
                best_mode="min",
            ),
        )
        self._executor = concurrent.futures.ThreadPoolExecutor(
            max_workers=1, thread_name_prefix="ckpt-save"
        )
        self._pending: Optional[concurrent.futures.Future] = None

    def _save_tree(self, step: int, tree: Dict[str, Any], meta: Dict) -> None:
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(tree),
                meta=ocp.args.JsonSave(meta),
            ),
            metrics={"val_loss": float(meta.get("val_loss", float("inf")))},
        )
        self._mngr.wait_until_finished()

    def save(
        self,
        step: int,
        state: TrainState,
        meta: Optional[Dict] = None,
        block: bool = True,
    ) -> None:
        meta = dict(meta or {})
        if block:
            self.wait()
            self._save_tree(step, _state_tree(state), meta)
            return
        # Serialize in-flight saves (Orbax manager access stays single-threaded
        # and transient HBM is bounded at one snapshot), then snapshot and go.
        self.wait()
        snap = _snapshot(_state_tree(state))
        self._pending = self._executor.submit(self._save_tree, step, snap, meta)

    def wait(self) -> None:
        """Block until any in-flight non-blocking save has committed.

        Re-raises the worker's exception (a failed checkpoint must not be
        silently dropped — the caller believes it was saved)."""
        if self._pending is not None:
            pending, self._pending = self._pending, None
            pending.result()

    def best_step(self) -> Optional[int]:
        self.wait()
        return self._mngr.best_step()

    def latest_step(self) -> Optional[int]:
        self.wait()
        return self._mngr.latest_step()

    def restore(
        self, state: TrainState, step: Optional[int] = None, best: bool = False
    ) -> Tuple[TrainState, Dict]:
        """Restore into the (structurally matching) freshly created state."""
        self.wait()
        if step is None:
            step = self.best_step() if best else self.latest_step()
        if step is None:
            raise FileNotFoundError(f"No checkpoints under {self.directory}")
        abstract = jax.tree.map(
            ocp.utils.to_shape_dtype_struct, _state_tree(state)
        )
        restored = self._mngr.restore(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardRestore(abstract),
                meta=ocp.args.JsonRestore(),
            ),
        )
        tree = restored["state"]
        new_state = state.replace(
            step=tree["step"],
            params=tree["params"],
            batch_stats=tree["batch_stats"],
            buffers=tree["buffers"],
            opt_state=tree["opt_state"],
            ema_params=tree["ema_params"],
        )
        return new_state, dict(restored["meta"] or {})

    def close(self) -> None:
        self.wait()
        self._executor.shutdown(wait=True)
        self._mngr.close()
