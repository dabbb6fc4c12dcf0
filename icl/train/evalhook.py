"""In-training dev evaluation hooks (L5, SURVEY §2.1 model layer).

The reference monitored validation metrics through Keras
``fit(validation_data=...)``; here the equivalent is a deterministic
``eval_fn`` handed to :func:`icl.train.loop.run_training`.  Evaluation uses
the grid-loss form in *deterministic* mode (no dropout): the model returns
``(Σ ce·w, Σ hits, Σ valid)`` per batch — via ``grid_ce_sums`` on CPU and
the fused grid head on TPU — and the hook normalizes across the whole eval
set, so the reported loss is exactly ``masked_weighted_ce`` over every
sampled dev cell (not a mean of per-batch means).
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from icl.train.steps import _cell_weights
from icl.util.log import LOG


def make_grid_eval_fn(model, table, eval_batches: list,
                      class_weights=None) -> Callable:
    """Build ``eval_fn(state) -> {"loss", "acc"}`` over fixed batches.

    ``eval_batches``: list of device-ready batch dicts that carry
    ``grid_label``/``grid_valid`` (RelationBatcher with ``build_grid=True``,
    or any AffinityBatcher batch).  The list is built ONCE (seeded shuffle
    in :func:`build_eval_hook`, then frozen), so successive evals are
    comparable point-to-point.
    """
    # A class weight <= 0 makes grid-form metrics degenerate (the kernel
    # derives validity from weight > 0, so that class would drop out of the
    # accuracy denominator).  The train step keeps the weights and falls
    # back to the pair-form loss; eval mirrors that weighting — eval_loss
    # stays point-comparable to the train loss — and recovers the
    # all-valid-cells accuracy from a second, uniform-weight apply
    # (eval-only cost, ADVICE r2 #2).
    degenerate = (class_weights is not None
                  and any(w <= 0 for w in class_weights))
    if degenerate:
        LOG.warning("eval hook: class weight <= 0 — eval_loss keeps the "
                    "train weighting; accuracy is computed from a second "
                    "uniform-weight pass so every valid cell counts")
    cw = (None if class_weights is None
          else jnp.asarray(class_weights, jnp.float32))
    prepared = []
    for jb in eval_batches:
        weights = _cell_weights(jb["grid_label"], jb["grid_valid"], cw)
        uniform = (None if not degenerate
                   else _cell_weights(jb["grid_label"], jb["grid_valid"],
                                      None))
        prepared.append((jb, weights, uniform, float(jnp.sum(weights))))

    @jax.jit
    def one(params, jb, weights):
        # labels come from jb's own grid_label — passing them as a second
        # arg duplicated the array in every call signature (r3 review)
        return model.apply({"params": params}, table, jb,
                           deterministic=True,
                           loss_grid=(jb["grid_label"], weights))

    def eval_fn(state):
        loss_sum = hits = nval = 0.0
        wsum = 0.0
        for jb, weights, uniform, w in prepared:
            ls, h, nv = one(state.params, jb, weights)
            if uniform is not None:
                _, h, nv = one(state.params, jb, uniform)
            loss_sum += float(ls)
            hits += float(h)
            nval += float(nv)
            wsum += w
        return {"loss": loss_sum / max(wsum, 1.0),
                "acc": hits / max(nval, 1.0)}

    return eval_fn


def build_eval_hook(args, model, table, mesh, load_dataset, batcher,
                    class_weights=None) -> Callable | None:
    """CLI glue: resolve --eval_every/--eval_split into an eval_fn.

    Returns None (with a log line explaining why) when eval is off, the
    split is missing, or the run is multi-process (eval batches would need
    the input-sharded path; monitoring is a single-host concern).
    """
    if not getattr(args, "eval_every", 0):
        return None
    if jax.process_count() > 1:
        LOG.warning("--eval_every ignored: multi-process run")
        return None
    from icl.dist.mesh import shard_batch
    try:
        ds = load_dataset(args.data_dir, args.eval_split)
    except FileNotFoundError as e:
        LOG.warning("--eval_every ignored: eval split %r not loadable (%s)",
                    args.eval_split, e)
        return None
    cap = max(getattr(args, "eval_batches", 16), 1)
    batches = []
    # seeded shuffle: the batchers schedule bucket-by-bucket, so taking the
    # FIRST cap batches unshuffled would evaluate only the smallest-bucket
    # (shortest/easiest) images; a fixed seed keeps evals comparable
    # point-to-point across the run
    rng = np.random.default_rng(getattr(args, "seed", 0))
    for b in batcher.batches(ds, rng=rng):
        batches.append(shard_batch(
            {k: jnp.asarray(v) for k, v in b.arrays.items()}, mesh))
        if len(batches) >= cap:
            break
    if not batches:
        LOG.warning("--eval_every ignored: eval split %r is empty",
                    args.eval_split)
        return None
    n = int(sum(np.asarray(b["img_valid"]).sum() for b in batches))
    mb = sum(sum(v.nbytes for v in b.values()) for b in batches) / 2**20
    LOG.info("eval hook: %d batches (%d images, %.0f MB pinned on device) "
             "from %s every %d steps",
             len(batches), n, mb, args.eval_split, args.eval_every)
    return make_grid_eval_fn(model, table, batches, class_weights)


def make_mention_eval_fn(model, table, eval_batches: list) -> Callable:
    """Mention-task (nonvisual/cardinality) analog of make_grid_eval_fn.

    ``eval_batches``: list of device-ready ``(token_ids, lengths, labels,
    valid)`` tuples.  Deterministic forward, shared :mod:`icl.ops.ce` CE,
    normalized across the whole eval set.
    """
    from icl.models.nonvisual import mean_pool_tokens
    from icl.ops.ce import onehot_ce

    @jax.jit
    def one(params, tok, ln, lab, valid):
        pooled = mean_pool_tokens(table, tok, ln)
        logits = model.apply({"params": params}, pooled, deterministic=True)
        ce, _ = onehot_ce(logits, lab)
        w = valid.astype(ce.dtype)
        hits = (jnp.argmax(logits, -1) == lab) & valid
        return (jnp.sum(ce * w), jnp.sum(hits.astype(jnp.float32)),
                jnp.sum(w))

    def eval_fn(state):
        loss_sum = hits = nval = 0.0
        for tok, ln, lab, valid in eval_batches:
            ls, h, nv = one(state.params, tok, ln, lab, valid)
            loss_sum += float(ls)
            hits += float(h)
            nval += float(nv)
        return {"loss": loss_sum / max(nval, 1.0),
                "acc": hits / max(nval, 1.0)}

    return eval_fn


def build_mention_eval_hook(args, model, table, mesh, task, emb,
                            bucketizer) -> Callable | None:
    """CLI glue for the mention tasks (mirrors build_eval_hook)."""
    if not getattr(args, "eval_every", 0):
        return None
    if jax.process_count() > 1:
        LOG.warning("--eval_every ignored: multi-process run")
        return None
    from icl.data.pipeline import load_mention_dataset
    from icl.dist.mesh import shard_batch
    try:
        ds = load_mention_dataset(args.data_dir, args.eval_split, task, emb)
    except FileNotFoundError as e:
        LOG.warning("--eval_every ignored: eval split %r not loadable (%s)",
                    args.eval_split, e)
        return None
    cap = max(getattr(args, "eval_batches", 16), 1)
    arrays = {"token_ids": ds.token_ids, "lengths": ds.lengths,
              "labels": ds.labels}
    rng = np.random.default_rng(getattr(args, "seed", 0))
    batches = []
    for _, b in bucketizer.batches(ds.lengths, arrays, ds.ids,
                                   shuffle_rng=rng):
        batches.append(shard_batch(
            (jnp.asarray(b.arrays["token_ids"]),
             jnp.asarray(b.arrays["lengths"]),
             jnp.asarray(b.arrays["labels"]),
             jnp.asarray(b.valid)), mesh))
        if len(batches) >= cap:
            break
    if not batches:
        LOG.warning("--eval_every ignored: eval split %r is empty",
                    args.eval_split)
        return None
    n = int(sum(np.asarray(v).sum() for *_, v in batches))
    LOG.info("eval hook: %d batches (%d mentions) from %s every %d steps",
             len(batches), n, args.eval_split, args.eval_every)
    return make_mention_eval_fn(model, table, batches)
