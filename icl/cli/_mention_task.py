"""Shared driver for mention-level FFNN tasks (nonvisual, cardinality).

This is the minimum end-to-end slice of SURVEY §9.2: `.feats` → mean-pool →
flax FFNN train step (jit) → `.scores` → ScoreDict, CPU-capable.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from icl import runtime
from icl.cli._common import (default_model_dir, default_scores_path,
                             dump_run_config, load_embeddings)
from icl.data.buckets import Bucketizer, BucketSpec
from icl.data.pipeline import load_mention_dataset
from icl.dist.mesh import replicate, shard_batch, sweep_data_axis_size
from icl.eval.scoredict import ScoreDict
from icl.io.scores import write_scores_sharded
from icl.models.nonvisual import mean_pool_tokens
from icl.train import create_train_state, make_mention_train_step
from icl.train.checkpoint import Checkpointer
from icl.train.loop import LoopConfig, run_training
from icl.train.steps import make_mention_predict
from icl.util.log import LOG


def run(args, task: str, model_cls, classes: tuple[str, ...]) -> None:
    from icl.cli._common import apply_precision
    apply_precision(args)
    rt = runtime.init(args.mesh, seed=args.seed,
                      coordinator=getattr(args, "coordinator", None),
                      num_processes=getattr(args, "num_processes", None),
                      process_id=getattr(args, "process_id", None),
                      compilation_cache_dir=getattr(
                          args, "compilation_cache_dir", None))
    emb = load_embeddings(args)
    table = replicate(jnp.asarray(emb.table), rt.mesh)
    ds = load_mention_dataset(args.data_dir, args.data_split, task, emb)
    LOG.info("%s %s: %d mentions", task, args.data_split, len(ds.ids))

    hidden = args.hidden_width or 300
    if args.predict:
        cfg_path = os.path.join(default_model_dir(args, task),
                                "model_config.json")
        if os.path.exists(cfg_path):
            hidden = json.load(open(cfg_path)).get("hidden", hidden)
    model = model_cls(hidden=hidden, dropout=args.dropout,
                      num_classes=len(classes))
    pooled0 = mean_pool_tokens(jnp.asarray(emb.table),
                               jnp.asarray(ds.token_ids[:1]),
                               jnp.asarray(ds.lengths[:1]))
    state = create_train_state(model, (pooled0,), seed=args.seed,
                               learn_rate=args.learn_rate)
    # committed replicated placement (see icl/cli/relation.py)
    state = replicate(state, rt.mesh)
    model_dir = default_model_dir(args, task)

    bs = args.batch_size
    ndev = sweep_data_axis_size(rt.mesh, bool(args.predict))
    if bs % ndev:
        bs = ((bs + ndev - 1) // ndev) * ndev
        LOG.warning("batch_size rounded up to %d (divisible by %d devices)",
                    bs, ndev)
    bz = Bucketizer(BucketSpec((ds.max_len,)), batch_size=bs)
    arrays = {"token_ids": ds.token_ids, "lengths": ds.lengths,
              "labels": ds.labels}

    if args.train:
        step = make_mention_train_step()

        def make_batches(epoch_rng, skip=0):
            multi = jax.process_count() > 1
            if multi:
                # mention batches are cheap to assemble, so every host
                # builds the (rng-deterministic, hence identical) global
                # batch and contributes just its own row slice — same
                # global arrays as shard_batch, no non-addressable puts
                from icl.dist.mesh import local_data_rows, shard_batch_local
                lo, hi = local_data_rows(rt.mesh, bs)
            for _, b in bz.batches(ds.lengths, arrays, ds.ids,
                                   shuffle_rng=epoch_rng, skip=skip):
                tup = (b.arrays["token_ids"], b.arrays["lengths"],
                       b.arrays["labels"], b.valid)
                if multi:
                    yield shard_batch_local(
                        tuple(np.asarray(a)[lo:hi] for a in tup),
                        rt.mesh, bs)
                else:
                    yield shard_batch(tuple(jnp.asarray(a) for a in tup),
                                      rt.mesh)

        from icl.train.evalhook import build_mention_eval_hook
        eval_fn = build_mention_eval_hook(args, model, table, rt.mesh,
                                          task, emb, bz)
        from icl.dist.mesh import is_main_process
        if is_main_process():
            dump_run_config(args, model_dir)
        cfg = LoopConfig(epochs=args.epochs, ckpt_dir=model_dir,
                         ckpt_every=args.ckpt_every,
                         profile_dir=args.profile_dir, resume=args.resume,
                         metrics_path=args.metrics_file, seed=args.seed,
                         eval_every=args.eval_every,
                         early_stop=args.early_stop, mesh=rt.mesh)
        state = run_training(state, lambda s, *a: step(s, table, *a),
                             make_batches, cfg, eval_fn=eval_fn)
        if is_main_process():
            with open(os.path.join(model_dir, "model_config.json"), "w") as f:
                json.dump({"task": task, "hidden": hidden,
                           "num_classes": len(classes),
                           "dropout": args.dropout}, f)
        LOG.info("trained to step %d; checkpoints in %s",
                 int(state.step), model_dir)
        return

    # --predict
    from icl.cli._common import begin_predict
    ckpt = Checkpointer(model_dir)
    state = ckpt.restore(state)
    if ckpt.latest_step is None:
        LOG.warning("no checkpoint found in %s — predicting from init",
                    model_dir)
    # multi-process: this host sweeps mentions[lo:hi) on a local mesh; the
    # `.scores` shards merge by byte-exact concatenation and floats match a
    # single-host sweep within 1 ulp of %.6f (_common.begin_predict)
    total_mentions = len(ds.ids)
    pmesh, state, table, (lo, hi) = begin_predict(
        rt, state, table, len(ds.ids))
    if (lo, hi) != (0, len(ds.ids)):
        import dataclasses
        ds = dataclasses.replace(ds, token_ids=ds.token_ids[lo:hi],
                                 lengths=ds.lengths[lo:hi],
                                 labels=ds.labels[lo:hi], ids=ds.ids[lo:hi])
        # `arrays` was captured from the FULL dataset above — rebuild from
        # the slice or the bucketizer pairs local lengths/ids with global
        # feature rows (caught by the 2-process merge test)
        arrays = {"token_ids": ds.token_ids, "lengths": ds.lengths,
                  "labels": ds.labels}
    predict = make_mention_predict(model.apply)
    probs_by_id: dict[str, np.ndarray] = {}

    def _consume(b, dev_p):
        p = np.asarray(dev_p)
        for row, eid in enumerate(b.ids):
            probs_by_id[eid] = p[row]

    # dispatch-ahead pipeline (see icl/cli/relation.py)
    import collections

    from icl.train.loop import prefetch
    pending: collections.deque = collections.deque()
    for _, b in prefetch(bz.batches(ds.lengths, arrays, ds.ids), depth=4):
        dev = predict(state.params, table,
                      *shard_batch((jnp.asarray(b.arrays["token_ids"]),
                                    jnp.asarray(b.arrays["lengths"])),
                                   pmesh))
        pending.append((b, dev))
        if len(pending) > 3:
            _consume(*pending.popleft())
    while pending:
        _consume(*pending.popleft())
    probs = (np.stack([probs_by_id[eid] for eid in ds.ids]) if ds.ids
             else np.zeros((0, len(classes))))
    if args.oracle_parity or args.oracle_parity_full:
        from icl.cli._common import report_parity
        from icl.eval.oracle import oracle_ffnn
        n = len(ds.ids) if args.oracle_parity_full else min(len(ds.ids), 256)
        if n:
            pooled = np.asarray(mean_pool_tokens(
                jnp.asarray(emb.table), jnp.asarray(ds.token_ids[:n]),
                jnp.asarray(ds.lengths[:n])))
            p_oracle = oracle_ffnn(jax.tree.map(np.asarray, state.params),
                                   pooled)
            report_parity(float(np.abs(probs[:n] - p_oracle).max()))
        else:
            # an empty sharded-predict slice has nothing to compare; a
            # synthetic PASS would falsely claim parity was verified (r4
            # advisor finding), so say explicitly that it was skipped.
            # Host-local print — no barrier involved, other hosts proceed.
            LOG.info("oracle parity skipped: empty predict slice")
            print("oracle-parity SKIPPED: empty predict slice")
    scores_path = default_scores_path(args, task)
    write_scores_sharded(scores_path, ds.ids, probs,
                         num_classes=len(classes),
                         total_examples=total_mentions, class_order=classes,
                         meta={"task": task, "split": args.data_split,
                               "checkpoint_step": int(state.step)})
    LOG.info("wrote %d scores (%d total) to %s", len(ds.ids),
             total_mentions, scores_path)
    if args.eval:
        # ds/probs are this host's mention slice under sharded predict; the
        # merged counts equal the single-process table (see relation.py)
        from icl.eval.scoredict import merge_sharded
        sd = ScoreDict(labels=list(classes))
        preds = probs.argmax(-1)
        for g, p in zip(ds.labels, preds):
            sd.increment(classes[int(g)], classes[int(p)])
        merged = merge_sharded(sd, scores_path)
        if merged is not None:
            print(merged.table())
