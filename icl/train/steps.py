"""jit-compiled train/predict steps per task (layer L5).

Reference parity: replaces Keras ``model.fit`` / per-example ``predict``
(SURVEY §4.1–4.4 left columns) with pure jit functions over fixed-shape
batches.  All losses are *masked* cross-entropies: padded rows/pairs/cells
contribute zero loss and zero gradient, and the normalizer is the count of
valid examples (so bucket padding never changes the expected gradient).

DP note: these steps contain no explicit collectives.  Under a
``jax.sharding.Mesh`` with batch inputs sharded on the 'data' axis and
replicated params, XLA inserts the gradient psum itself (SURVEY §3.4) —
the step function is topology-agnostic by construction.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax

from icl.models.nonvisual import mean_pool_tokens
from icl.train.state import TrainState


def masked_weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray,
                       class_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean CE over valid entries; optional per-class weights (§6.4 uses
    class-weighted CE because ~90% of relation pairs are null)."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    w = valid.astype(ce.dtype)
    if class_weights is not None:
        w = w * jnp.take(class_weights, labels)
    return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0)


def _accuracy(logits, labels, valid):
    hit = (jnp.argmax(logits, -1) == labels) & valid
    return jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)


# ---------------------------------------------------------------------------
# Mention-level tasks (nonvisual, cardinality): flat [N, L] token batches
# ---------------------------------------------------------------------------

def make_mention_train_step(donate: bool = True) -> Callable:
    """Train step for FFNN-over-mean-w2v tasks (SURVEY §4.4 target)."""

    def step(state: TrainState, emb_table, token_ids, lengths, labels, valid):
        drng = state.step_rng()

        def loss_fn(params):
            pooled = mean_pool_tokens(emb_table, token_ids, lengths)
            logits = state.apply_fn({"params": params}, pooled,
                                    deterministic=False, rngs={"dropout": drng})
            loss = masked_weighted_ce(logits, labels, valid)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {"loss": loss, "acc": _accuracy(logits, labels, valid)}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_mention_predict(apply_fn) -> Callable:
    @jax.jit
    def predict(params, emb_table, token_ids, lengths):
        pooled = mean_pool_tokens(emb_table, token_ids, lengths)
        logits = apply_fn({"params": params}, pooled, deterministic=True)
        return jax.nn.softmax(logits, axis=-1)

    return predict


# ---------------------------------------------------------------------------
# Relation: image-centric batches (SURVEY §4.1 target)
# ---------------------------------------------------------------------------

def make_relation_train_step(class_weights=None, donate: bool = True) -> Callable:
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step(state: TrainState, emb_table, batch):
        drng = state.step_rng()

        def loss_fn(params):
            logits = state.apply_fn({"params": params}, emb_table, batch,
                                    deterministic=False, rngs={"dropout": drng})
            loss = masked_weighted_ce(logits, batch["pair_label"],
                                      batch["pair_valid"], cw)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {
            "loss": loss,
            "acc": _accuracy(logits, batch["pair_label"], batch["pair_valid"]),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_relation_predict(apply_fn) -> Callable:
    @jax.jit
    def predict(params, emb_table, batch):
        logits = apply_fn({"params": params}, emb_table, batch, deterministic=True)
        return jax.nn.softmax(logits, axis=-1)      # [I, P, 4]

    return predict


# ---------------------------------------------------------------------------
# Affinity: image-grid batches (SURVEY §4.3 target)
# ---------------------------------------------------------------------------

def make_affinity_train_step(class_weights=None, donate: bool = True) -> Callable:
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step(state: TrainState, emb_table, batch):
        drng = state.step_rng()

        def loss_fn(params):
            logits = state.apply_fn({"params": params}, emb_table, batch,
                                    deterministic=False, rngs={"dropout": drng})
            loss = masked_weighted_ce(logits, batch["grid_label"],
                                      batch["grid_valid"], cw)
            return loss, logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads)
        return new_state, {
            "loss": loss,
            "acc": _accuracy(logits, batch["grid_label"], batch["grid_valid"]),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_affinity_predict(apply_fn) -> Callable:
    @jax.jit
    def predict(params, emb_table, batch):
        logits = apply_fn({"params": params}, emb_table, batch, deterministic=True)
        return jax.nn.softmax(logits, axis=-1)      # [I, M, B, 2]

    return predict
