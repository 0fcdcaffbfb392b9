"""EMA weight averaging (reference ``smoothener/_ema.py:7-32``).

The reference keeps a frozen deep-copied shadow model and updates
``ema <- (1-m)*ema + m*param`` with a ramped new-param weight
``m(n) = 1 - (1 - m0) * (1 - exp(-n / N))`` — m starts at ~1 (EMA tracks the
live params early) and decays to ``m0``. Note the reference's "momentum" is
the *new-param* weight, the inverse of the usual decay convention; we keep its
convention for config compatibility.

Here the EMA is a pure pytree transform inside the jitted train step.

Documented deviation: the reference deep-copies the whole model at t=0, so the
EMA model evaluates with *initial* BatchNorm running stats forever (buffers are
never updated on the eval-mode shadow). That is a reference bug; we evaluate
EMA params together with the live model's current batch stats.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EMAState(NamedTuple):
    params: Any
    num_updates: jax.Array  # int32 scalar


def ema_init(params: Any, num_updates: int = 0) -> EMAState:
    # Genuine copies: the shadow must not alias the live params (aliasing
    # breaks buffer donation in the jitted train step).
    return EMAState(
        params=jax.tree.map(lambda p: jnp.array(p, copy=True), params),
        num_updates=jnp.asarray(num_updates, jnp.int32),
    )


def ema_update(state: EMAState, params: Any, momentum: float = 0.002, n_ramp: int = 2000) -> EMAState:
    n = state.num_updates + 1
    m = 1.0 - (1.0 - momentum) * (1.0 - jnp.exp(-n.astype(jnp.float32) / n_ramp))
    new_params = jax.tree.map(lambda e, p: (1.0 - m) * e + m * p, state.params, params)
    return EMAState(params=new_params, num_updates=n)
