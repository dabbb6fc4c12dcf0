"""Train state: params + optimizer + step + rng (layer L5).

The reference had no train-state abstraction — Keras ``fit`` owned weights
and optimizer internally and only final weights were saved (SURVEY §5.4).
Here the full state (params, opt state, step counter, dropout rng) is one
pytree so orbax can checkpoint/resume mid-run (SURVEY §5.3/5.4).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray            # int32 scalar
    rng: jax.Array               # dropout rng, folded per step
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)
    apply_fn: Callable = flax.struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt = self.tx.update(grads, self.opt_state, self.params)
        return self.replace(
            params=optax.apply_updates(self.params, updates),
            opt_state=new_opt,
            step=self.step + 1,
        )

    def step_rng(self) -> jax.Array:
        return jax.random.fold_in(self.rng, self.step)


def create_train_state(module, init_args: tuple, seed: int = 0,
                       learn_rate: float = 1e-3,
                       tx: optax.GradientTransformation | None = None) -> TrainState:
    """Initialize params (param_rng) and Adam (reference default, §6.3)."""
    rng = jax.random.PRNGKey(seed)
    param_rng, dropout_rng = jax.random.split(rng)
    params = module.init({"params": param_rng}, *init_args)["params"]
    tx = tx or optax.adam(learn_rate)
    return TrainState(
        params=params, opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32), rng=dropout_rng,
        tx=tx, apply_fn=module.apply,
    )
