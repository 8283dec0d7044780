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

import os
from typing import Any, Dict, Optional, Tuple

import jax
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


class CheckpointManager:
    """Keeps the latest checkpoints and tracks the best validation loss."""

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

    def save(self, step: int, state: TrainState, meta: Optional[Dict] = None) -> None:
        meta = dict(meta or {})
        self._mngr.save(
            step,
            args=ocp.args.Composite(
                state=ocp.args.StandardSave(_state_tree(state)),
                meta=ocp.args.JsonSave(meta),
            ),
            metrics={"val_loss": float(meta.get("val_loss", float("inf")))},
        )
        self._mngr.wait_until_finished()

    def best_step(self) -> Optional[int]:
        return self._mngr.best_step()

    def latest_step(self) -> Optional[int]:
        return self._mngr.latest_step()

    def restore(
        self, state: TrainState, step: Optional[int] = None, best: bool = False
    ) -> Tuple[TrainState, Dict]:
        """Restore into the (structurally matching) freshly created state."""
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
        self._mngr.close()
