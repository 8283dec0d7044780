"""Train state: params + batch stats + optimizer + working EMA.

Replaces the reference's TrainingPipeline state handling (sbgm/training.py:41-244)
with a single pytree that jits/shards cleanly. Fixes two declared-but-dead
features of the reference: the EMA deepcopy that is never updated
(training.py:111-117) and the LR scheduler that is never stepped — here EMA
updates every optimizer step inside the compiled train step, and the learning
rate is an optax injected hyperparameter the host-side scheduler can adjust
between epochs (ReduceLROnPlateau needs runtime validation losses, so it cannot
be a static optax schedule).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from sbgm_danra_tpu.config import Config


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    buffers: Any
    opt_state: Any
    ema_params: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    ema_decay: float = flax.struct.field(pytree_node=False, default=0.9999)
    use_ema: bool = flax.struct.field(pytree_node=False, default=True)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        if self.use_ema:
            d = self.ema_decay
            new_ema = jax.tree.map(
                lambda e, p: d * e + (1.0 - d) * p, self.ema_params, new_params
            )
        else:
            new_ema = self.ema_params
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )

    @property
    def learning_rate(self) -> float:
        return float(_find_hyperparams(self.opt_state)["learning_rate"])

    def with_learning_rate(self, lr: float) -> "TrainState":
        """Return a state with the injected learning rate replaced."""

        def rewrite(node):
            if hasattr(node, "hyperparams"):
                hp = dict(node.hyperparams)
                hp["learning_rate"] = jnp.asarray(lr, jnp.float32)
                return node._replace(hyperparams=hp)
            return node

        new_opt = jax.tree.map(
            rewrite,
            self.opt_state,
            is_leaf=lambda n: hasattr(n, "hyperparams"),
        )
        return self.replace(opt_state=new_opt)


def _find_hyperparams(opt_state) -> Dict[str, Any]:
    found = {}

    def visit(node):
        if hasattr(node, "hyperparams"):
            found.update(node.hyperparams)
            return node
        return node

    jax.tree.map(visit, opt_state, is_leaf=lambda n: hasattr(n, "hyperparams"))
    if not found:
        raise ValueError("Optimizer state has no injected hyperparams")
    return found


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Optimizer factory (reference training_utils.py:672-698).

    torch.optim.Adam's weight_decay is L2-added-to-gradients, reproduced with
    add_decayed_weights BEFORE the adam transform; adamw uses decoupled decay.
    The learning rate is injected so host-side schedulers can update it.
    """
    t = cfg.training

    def build(learning_rate):
        if t.optimizer == "adam":
            return optax.chain(
                optax.add_decayed_weights(t.weight_decay),
                optax.adam(learning_rate),
            )
        if t.optimizer == "adamw":
            return optax.adamw(learning_rate, weight_decay=t.weight_decay)
        if t.optimizer == "sgd":
            return optax.chain(
                optax.add_decayed_weights(t.weight_decay),
                optax.sgd(learning_rate, momentum=t.momentum),
            )
        raise ValueError(f"Unknown optimizer: {t.optimizer}")

    return optax.inject_hyperparams(build)(learning_rate=t.learning_rate)


def xavier_init_convs(params, rng: jax.Array):
    """Re-initialize conv kernels with Xavier-uniform, biases to 0.01.

    Mirrors the reference's xavier_init_weights applied to Conv2d/ConvTranspose2d
    (training.py:188-201). Conv kernels are the rank-4 leaves; their sibling
    'bias' leaves are set to 0.01. Dense/attention params keep their defaults
    (the reference initializer also only touches convolutions).
    """
    flat = flax.traverse_util.flatten_dict(params)
    keys = jax.random.split(rng, len(flat))
    init = jax.nn.initializers.xavier_uniform()
    conv_paths = set()
    for (path, leaf), key in zip(sorted(flat.items()), keys):
        if path[-1] == "kernel" and getattr(leaf, "ndim", 0) == 4:
            flat[path] = init(key, leaf.shape, leaf.dtype)
            conv_paths.add(path[:-1])
    for path, leaf in flat.items():
        if path[-1] == "bias" and path[:-1] in conv_paths:
            flat[path] = jnp.full_like(leaf, 0.01)
    return flax.traverse_util.unflatten_dict(flat)


def create_train_state(
    cfg: Config,
    model,
    sample_batch: Dict[str, jnp.ndarray],
    rng: jax.Array,
    variables: Optional[Dict[str, Any]] = None,
) -> TrainState:
    """Initialize model variables + optimizer into a TrainState.

    ``variables`` short-circuits model.init with pre-built variables (e.g.
    bench.py's disk-cached init — eager init over the remote tunnel costs
    minutes); everything else (xavier re-init, optimizer, EMA copies) is
    unchanged.
    """
    init_rng, xavier_rng = jax.random.split(rng)
    sample_batch = dict(sample_batch)
    if "t" not in sample_batch:
        sample_batch["t"] = jnp.zeros((sample_batch["x"].shape[0],), jnp.float32)
    if variables is None:
        variables = model.init({"params": init_rng}, **sample_batch, train=False)
    params = variables["params"]
    if cfg.training.weight_init:
        params = xavier_init_convs(params, xavier_rng)
    tx = make_optimizer(cfg)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        buffers=variables.get("buffers", {}),
        opt_state=tx.init(params),
        # real copies, not aliases: params and ema_params are both donated by
        # the jitted train step, and XLA rejects donating one buffer twice
        ema_params=jax.tree.map(jnp.copy, params),
        tx=tx,
        ema_decay=cfg.training.ema_decay,
        use_ema=cfg.training.with_ema,
    )


def model_variables(state: TrainState, use_ema: bool = False) -> Dict[str, Any]:
    """Variables dict for model.apply from a TrainState."""
    return {
        "params": state.ema_params if use_ema else state.params,
        "batch_stats": state.batch_stats,
        "buffers": state.buffers,
    }
