"""Train state and optimizer construction.

Optimizer parity with reference ``utils/train.py::train`` (SGD, momentum
0.9, weight decay 1e-5, lr ladder stepped on a global-step schedule):
torch's SGD adds weight decay to the gradient BEFORE the momentum buffer,
so the optax chain is add_decayed_weights -> sgd(momentum).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.struct
import jax
import optax


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def lr_ladder(lrs: Sequence[float], boundaries: Sequence[int]) -> optax.Schedule:
    """Piecewise-constant lr: lrs[i] between boundaries[i-1] and boundaries[i]."""
    lrs = list(lrs)
    boundaries = list(boundaries)
    if len(lrs) == 1:
        return optax.constant_schedule(lrs[0])
    assert len(boundaries) >= len(lrs) - 1, "need a boundary per lr step"
    scales = {int(b): lrs[i + 1] / lrs[i] for i, b in enumerate(boundaries[: len(lrs) - 1])}
    return optax.piecewise_constant_schedule(lrs[0], scales)


def make_optimizer(
    lrs: Sequence[float] = (0.1, 0.01, 0.001),
    boundaries: Sequence[int] = (3000, 6000),
    momentum: float = 0.9,
    weight_decay: float = 1e-5,
    nesterov: bool = False,
) -> optax.GradientTransformation:
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.sgd(lr_ladder(lrs, boundaries), momentum=momentum, nesterov=nesterov),
    )


def create_train_state(model, tx: optax.GradientTransformation, rng: jax.Array, input_shape=(1, 101, 40)) -> TrainState:
    import jax.numpy as jnp

    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32), train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )
