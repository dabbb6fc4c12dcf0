"""In-training dev evaluation hooks (L5, SURVEY §2.1 model layer).

The reference monitored validation metrics through Keras
``fit(validation_data=...)``; here the equivalent is a deterministic
``eval_fn`` handed to :func:`icl.train.loop.run_training`.  Evaluation uses
the grid-loss form in *deterministic* mode (no dropout): the model returns
``(Σ ce·w, Σ hits, Σ valid)`` per batch — via ``grid_ce_sums`` on CPU and
the fused grid head on TPU — and the hook normalizes across the whole eval
set, so the reported loss is exactly ``masked_weighted_ce`` over every
sampled dev cell (not a mean of per-batch means).

Multi-host (VERDICT r3 missing#1): eval batches are rng-deterministic, so
every process builds the IDENTICAL host-side batch list, contributes only
its own data-axis row slice via ``shard_batch_local``, and runs the same
jitted reduction — the (Σ ce·w, Σ hits, Σ valid) outputs are fully
replicated global scalars, so ``float()`` reads the SAME value on every
process and the early-stop decision in :mod:`icl.train.loop` stays in
lockstep without any extra broadcast.  Weight sums are computed host-side
from the full (pre-slice) batch, so normalization is global by
construction.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

import jax
import jax.numpy as jnp

from icl.util.log import LOG


def _host_cell_weights(labels, valid, class_weights) -> np.ndarray:
    """Host-numpy mirror of icl.train.steps._cell_weights (same unrolled
    per-class selection, so values are bitwise-identical float32)."""
    w = np.asarray(valid).astype(np.float32)
    if class_weights is None:
        return w
    cw = np.asarray(class_weights, np.float32)
    sel = np.zeros(np.shape(labels), np.float32)
    labels = np.asarray(labels)
    for k in range(cw.shape[0]):
        sel[labels == k] = cw[k]
    return w * sel


def _eval_placer(mesh) -> Callable:
    """tree-of-host-arrays -> device-ready tree, sharded on the data axis.

    Single-process: plain :func:`icl.dist.mesh.shard_batch`.  Multi-process:
    every host holds the full batch (deterministic build), slices its own
    contiguous [lo, hi) data-axis rows, and assembles the global array via
    ``shard_batch_local`` — no host ever puts non-addressable shards.
    """
    from icl.dist.mesh import shard_batch

    if jax.process_count() == 1:
        return lambda tree: shard_batch(
            jax.tree.map(jnp.asarray, tree), mesh)

    from icl.dist.mesh import local_data_rows, shard_batch_local

    def place(tree):
        n = int(np.shape(jax.tree.leaves(tree)[0])[0])
        lo, hi = local_data_rows(mesh, n)
        local = jax.tree.map(lambda x: np.asarray(x)[lo:hi], tree)
        return shard_batch_local(local, mesh, n)

    return place


def make_grid_eval_fn(model, table, eval_batches: list, mesh,
                      class_weights=None, pin: bool = True) -> Callable:
    """Build ``eval_fn(state) -> {"loss", "acc"}`` over fixed batches.

    ``eval_batches``: list of HOST-side batch dicts that carry
    ``grid_label``/``grid_valid`` (RelationBatcher with ``build_grid=True``,
    or any AffinityBatcher batch).  The list is built ONCE (seeded shuffle
    in :func:`build_eval_hook`, then frozen), so successive evals are
    comparable point-to-point.

    ``pin=True`` places every batch on the mesh once and holds it for the
    whole run (fastest; device memory = the whole sample — the hook log
    prints the MB).  ``pin=False`` streams each batch to device per eval
    call instead (one batch resident at a time) — the ``--eval_batches 0``
    whole-split mode, where pinning the full dev split would not fit.
    Both modes run the identical jitted reduction on identical values, so
    losses are bitwise-equal (tests/integration/test_eval_full_split.py).
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
    place = _eval_placer(mesh)
    prepared = []
    for hb in eval_batches:
        weights = _host_cell_weights(hb["grid_label"], hb["grid_valid"],
                                     class_weights)
        # weight sum from the FULL host batch: the global normalizer, even
        # when this process only feeds a row slice below
        wsum = float(weights.sum())
        tree = {"b": hb, "w": weights}
        if degenerate:
            tree["u"] = _host_cell_weights(hb["grid_label"],
                                           hb["grid_valid"], None)
        prepared.append((place(tree) if pin else tree, wsum))

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
        for tree, w in prepared:
            dev = tree if pin else place(tree)
            jb, weights, uniform = dev["b"], dev["w"], dev.get("u")
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

    Returns None (with a log line explaining why) when eval is off or the
    split is missing.  Multi-process runs are supported: every process
    builds the identical batch list (deterministic rng) and feeds its own
    data-axis slice (module docstring)."""
    if not getattr(args, "eval_every", 0):
        return None
    try:
        ds = load_dataset(args.data_dir, args.eval_split)
    except FileNotFoundError as e:
        LOG.warning("--eval_every ignored: eval split %r not loadable (%s)",
                    args.eval_split, e)
        return None
    cap_arg = getattr(args, "eval_batches", 16)
    full = cap_arg == 0          # 0 = the WHOLE split, streamed per eval
    cap = None if full else max(cap_arg, 1)
    batches = []
    # seeded shuffle: the batchers schedule bucket-by-bucket, so taking the
    # FIRST cap batches unshuffled would evaluate only the smallest-bucket
    # (shortest/easiest) images; a fixed seed keeps evals comparable
    # point-to-point across the run (and identical across processes)
    rng = np.random.default_rng(getattr(args, "seed", 0))
    for b in batcher.batches(ds, rng=rng):
        batches.append({k: np.asarray(v) for k, v in b.arrays.items()})
        if cap is not None and len(batches) >= cap:
            break
    if not batches:
        LOG.warning("--eval_every ignored: eval split %r is empty",
                    args.eval_split)
        return None
    n = int(sum(b["img_valid"].sum() for b in batches))
    mb = sum(sum(v.nbytes for v in b.values()) for b in batches) / 2**20
    LOG.info("eval hook: %d batches (%d images, %.0f MB %s) "
             "from %s every %d steps",
             len(batches), n, mb,
             "streamed to device per eval" if full else "pinned on device",
             args.eval_split, args.eval_every)
    return make_grid_eval_fn(model, table, batches, mesh, class_weights,
                             pin=not full)


def make_mention_eval_fn(model, table, eval_batches: list, mesh,
                         pin: bool = True) -> Callable:
    """Mention-task (nonvisual/cardinality) analog of make_grid_eval_fn.

    ``eval_batches``: list of HOST-side ``(token_ids, lengths, labels,
    valid)`` tuples.  Deterministic forward, shared :mod:`icl.ops.ce` CE,
    normalized across the whole eval set.  ``pin`` as in
    :func:`make_grid_eval_fn`: device-resident batches vs streamed per
    eval call (the ``--eval_batches 0`` whole-split mode).
    """
    from icl.models.nonvisual import mean_pool_tokens
    from icl.ops.ce import onehot_ce

    place = _eval_placer(mesh)
    prepared = [place(hb) if pin else hb for hb in eval_batches]

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
        for hb in prepared:
            tok, ln, lab, valid = hb if pin else place(hb)
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
    from icl.data.pipeline import load_mention_dataset
    try:
        ds = load_mention_dataset(args.data_dir, args.eval_split, task, emb)
    except FileNotFoundError as e:
        LOG.warning("--eval_every ignored: eval split %r not loadable (%s)",
                    args.eval_split, e)
        return None
    cap_arg = getattr(args, "eval_batches", 16)
    full = cap_arg == 0          # 0 = the WHOLE split, streamed per eval
    cap = None if full else max(cap_arg, 1)
    arrays = {"token_ids": ds.token_ids, "lengths": ds.lengths,
              "labels": ds.labels}
    rng = np.random.default_rng(getattr(args, "seed", 0))
    batches = []
    for _, b in bucketizer.batches(ds.lengths, arrays, ds.ids,
                                   shuffle_rng=rng):
        batches.append((np.asarray(b.arrays["token_ids"]),
                        np.asarray(b.arrays["lengths"]),
                        np.asarray(b.arrays["labels"]),
                        np.asarray(b.valid)))
        if cap is not None and len(batches) >= cap:
            break
    if not batches:
        LOG.warning("--eval_every ignored: eval split %r is empty",
                    args.eval_split)
        return None
    n = int(sum(v.sum() for *_, v in batches))
    LOG.info("eval hook: %d batches (%d mentions, %s) from %s every "
             "%d steps", len(batches), n,
             "streamed per eval" if full else "pinned on device",
             args.eval_split, args.eval_every)
    return make_mention_eval_fn(model, table, batches, mesh, pin=not full)
