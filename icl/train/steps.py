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

from icl.models.nonvisual import mean_pool_tokens
from icl.train.state import TrainState


def masked_weighted_ce(logits: jnp.ndarray, labels: jnp.ndarray,
                       valid: jnp.ndarray,
                       class_weights: jnp.ndarray | None = None) -> jnp.ndarray:
    """Mean CE over valid entries; optional per-class weights (§6.4 uses
    class-weighted CE because ~90% of relation pairs are null).

    The per-cell CE is the shared :mod:`icl.ops.ce` definition (same
    helper grid_ce_sums and the in-kernel grid CE mirror), so pair-form
    and grid-form training losses cannot drift apart.
    """
    from icl.ops.ce import onehot_ce
    ce, onehot = onehot_ce(logits, labels)
    w = valid.astype(ce.dtype)
    if class_weights is not None:
        w = w * jnp.sum(onehot * class_weights, axis=-1)
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

def _cell_weights(labels, valid, cw):
    """``valid · class_weight[label]`` without a gather: the class count is
    a small static constant, so unrolled selects beat a TPU gather op."""
    w = valid.astype(jnp.float32)
    if cw is None:
        return w
    sel = jnp.zeros(labels.shape, jnp.float32)
    for k in range(cw.shape[0]):
        sel = jnp.where(labels == k, cw[k], sel)
    return w * sel


def _grid_loss_step(state, emb_table, batch, labels, weights, drng):
    """Shared grid-loss core: model returns (Σ ce·w, Σ hits, Σ valid) —
    on the fused TPU path via ``grid_head_train_loss`` (logits never reach
    HBM), elsewhere via the ``grid_ce_sums`` XLA oracle.  Loss/acc values
    reproduce ``masked_weighted_ce``/``_accuracy`` over the same cells."""
    wsum = jnp.maximum(jnp.sum(weights), 1.0)

    def loss_fn(params):
        loss_sum, hits, nval = state.apply_fn(
            {"params": params}, emb_table, batch, deterministic=False,
            rngs={"dropout": drng}, loss_grid=(labels, weights))
        return loss_sum / wsum, (hits, nval)

    (loss, (hits, nval)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    new_state = state.apply_gradients(grads)
    return new_state, {"loss": loss, "acc": hits / jnp.maximum(nval, 1.0)}


def make_relation_train_step(class_weights=None, donate: bool = True,
                             grid_loss: bool = False) -> Callable:
    """``grid_loss=True`` (the fused-TPU production mode) computes the CE
    over the model's full M×M logit grid instead of gathered pair cells:
    pair labels/weights are scattered into grid form ONCE per step —
    *outside* ``value_and_grad`` — and the CE itself runs inside the
    grid-head kernel (``grid_head_train_loss``), so neither the grid→pair
    gather, its scatter transpose, nor the logits themselves ever touch
    HBM.  The loss value is identical to the pair form: valid grid cells
    are exactly the valid pairs (scatter adds are duplicate-free because
    the pair list enumerates distinct i<j cells; padded pairs contribute
    zero weight).

    Grid-loss accuracy counts cells with weight > 0, so a class weight of
    0 would silently drop that class from the accuracy denominator (the
    pair form counts every valid pair) — the guard below keeps the pair
    form in that edge case so metric semantics never depend on the fused
    gate."""
    if grid_loss and class_weights is not None and any(
            w <= 0 for w in class_weights):
        from icl.util.log import LOG
        LOG.warning("grid_loss disabled: a class weight <= 0 would drop "
                    "that class from the in-kernel accuracy denominator; "
                    "keeping the pair-form step for consistent metrics")
        grid_loss = False
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step(state: TrainState, emb_table, batch):
        drng = state.step_rng()

        if grid_loss:
            if "grid_label" in batch:
                # production pipeline: grid form built on the host
                # (icl.data.imagebatch) — no device scatter at all
                glabel, gvalid = batch["grid_label"], batch["grid_valid"]
            else:
                # fallback for pair-only batches: scatter once per step
                # (duplicate-free: the pair list enumerates distinct cells)
                pij, pv = batch["pair_ij"], batch["pair_valid"]
                I = pv.shape[0]
                Mm = batch["m_cap"].shape[1]
                ii = jnp.arange(I, dtype=jnp.int32)[:, None]
                glabel = jnp.zeros((I, Mm, Mm), jnp.int32).at[
                    ii, pij[:, :, 0], pij[:, :, 1]].add(
                        jnp.where(pv, batch["pair_label"], 0))
                gvalid = jnp.zeros((I, Mm, Mm), jnp.int32).at[
                    ii, pij[:, :, 0], pij[:, :, 1]].add(
                        pv.astype(jnp.int32)) > 0
            gweight = _cell_weights(glabel, gvalid, cw)
            return _grid_loss_step(state, emb_table, batch, glabel, gweight,
                                   drng)

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
            "acc": _accuracy(logits, batch["pair_label"],
                             batch["pair_valid"]),
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

def make_affinity_train_step(class_weights=None, donate: bool = True,
                             grid_loss: bool = False) -> Callable:
    """``grid_loss=True``: affinity labels are already grid-shaped, so the
    in-kernel CE (see make_relation_train_step) applies directly — no
    scatter needed.  Same zero-class-weight metric guard as the relation
    step."""
    if grid_loss and class_weights is not None and any(
            w <= 0 for w in class_weights):
        from icl.util.log import LOG
        LOG.warning("grid_loss disabled: a class weight <= 0 would drop "
                    "that class from the in-kernel accuracy denominator; "
                    "keeping the cell-form step for consistent metrics")
        grid_loss = False
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)

    def step(state: TrainState, emb_table, batch):
        drng = state.step_rng()

        if grid_loss:
            gweight = _cell_weights(batch["grid_label"],
                                    batch["grid_valid"], cw)
            return _grid_loss_step(state, emb_table, batch,
                                   batch["grid_label"], gweight, drng)

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
