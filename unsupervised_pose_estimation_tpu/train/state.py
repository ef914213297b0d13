"""Train state: parameters, BN statistics, optimizer state, step counter.

A functional replacement for the reference Trainer's mutable model dict +
torch Adam (`/root/reference/trainer.py:80-183`). The whole state is a pytree
so one jitted train step updates it in place on device; checkpointing
serializes the tree atomically (train/checkpoint.py).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import flax.struct
import jax
import optax


class TrainState(flax.struct.PyTreeNode):
    step: jax.Array
    params: Dict[str, Any]
    batch_stats: Dict[str, Any]
    frozen: Dict[str, Any]
    opt_state: optax.OptState
    disc_params: Optional[Dict[str, Any]] = None
    disc_opt_state: Optional[optax.OptState] = None


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    # torch Adam defaults (betas (0.9, 0.999), eps 1e-8), trainer.py:183
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


def make_disc_optimizer(lr: float, b1: float, b2: float):
    # trainer.py:104
    return optax.adam(lr, b1=b1, b2=b2, eps=1e-8)


def create_train_state(bundle, rng, learning_rate: float) -> TrainState:
    import jax.numpy as jnp

    variables = bundle.init(rng)
    tx = make_optimizer(learning_rate)
    opt_state = tx.init(variables["params"])
    disc_params = variables.get("disc_params")
    disc_opt_state = None
    if disc_params is not None:
        disc_opt_state = make_disc_optimizer(
            bundle.cfg.discriminator_lr, bundle.cfg.b1,
            bundle.cfg.b2).init(disc_params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=variables["params"],
        batch_stats=variables["batch_stats"],
        frozen=variables["frozen"],
        opt_state=opt_state,
        disc_params=disc_params,
        disc_opt_state=disc_opt_state,
    )
