"""Train state: params + optimizer + step + PRNG, as one pytree.

The reference has no train-state abstraction at all — its loop keeps an
``nn.Module`` and an ``optim.Adam`` on the Python side and saves only the
model weights (``train_conditional_nerf.py:160-161``), so runs cannot
resume.  Here the full state (params, Adam moments, step counter, PRNG key)
is a single pytree: jittable, shardable, checkpointable (SURVEY.md §5
checkpoint/resume requirement).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

Params = Any


class TrainState(NamedTuple):
    step: jax.Array  # int32 scalar
    params: Params
    opt_state: optax.OptState
    key: jax.Array  # PRNG key data (uint32[2]) — raw for serializability


def create_train_state(
    params: Params, optimizer: optax.GradientTransformation, seed: int = 0
) -> TrainState:
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=optimizer.init(params),
        key=jax.random.key_data(jax.random.PRNGKey(seed)),
    )


def fold_key(state: TrainState) -> jax.Array:
    """Derive this step's PRNG key from the state (stable across resume)."""
    key = jax.random.wrap_key_data(state.key, impl="threefry2x32")
    return jax.random.fold_in(key, state.step)
