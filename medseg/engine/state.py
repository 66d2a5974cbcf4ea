"""Training state pytree: params + optimizer state + step + PRNG.

The reference checkpoints only ``model.state_dict()`` — optimizer state is
lost on resume (SURVEY.md §5 "Checkpoint / resume"). Here the full state is
one pytree so checkpoints capture everything (params, AdamW moments, step,
PRNG key) and resume is exact.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any
    rng: jax.Array

    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def adamw(learning_rate: float, weight_decay: float) -> optax.GradientTransformation:
    """torch.optim.AdamW semantics (decoupled decay scaled by lr) — the
    reference optimizer (`unetr_segmentation_3d.py:522`: lr CLI, wd 1e-5)."""
    return optax.adamw(
        learning_rate=learning_rate,
        b1=0.9,
        b2=0.999,
        eps=1e-8,
        weight_decay=weight_decay,
    )


def create_train_state(
    model,
    *,
    rng: jax.Array,
    sample_input: jax.Array,
    learning_rate: float,
    weight_decay: float,
    params: Any | None = None,
) -> TrainState:
    init_rng, state_rng = jax.random.split(rng)
    if params is None:
        # jit: eager (op-by-op) init of the UNETR tree costs ~60s of pure
        # dispatch overhead on CPU vs ~3s compiled — and params are tiny
        params = jax.jit(model.init)(init_rng, sample_input)
    tx = adamw(learning_rate, weight_decay)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        rng=state_rng,
        tx=tx,
    )
