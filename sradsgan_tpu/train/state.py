"""Train state: generator + optional discriminator, as one pytree."""

from __future__ import annotations

from typing import Any, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax


class GANTrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    g_params: Any
    g_stats: Any                 # batch_stats collection ({} if none)
    g_opt: Any
    d_params: Optional[Any] = None
    d_stats: Optional[Any] = None
    d_opt: Optional[Any] = None


def make_optimizer(lr: float, b1: float, b2: float) -> optax.GradientTransformation:
    """Adam with host-adjustable learning rate (plateau halving).

    ``inject_hyperparams`` keeps the lr inside the optimizer state so the
    plateau-backtrack controller can halve it without recompiling the step.
    """
    return optax.inject_hyperparams(optax.adam)(learning_rate=lr, b1=b1,
                                                b2=b2)


def get_lr(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


def set_lr(opt_state, lr: float):
    """InjectHyperparamsState is a NamedTuple; rebuild with the new lr."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)
