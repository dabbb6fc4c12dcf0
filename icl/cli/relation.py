"""icl-relation — pairwise mention-relation classifier CLI (SURVEY §4.1–4.2).

Reference parity: mirrors ``icl_relation.py``; same train/predict surface,
`.scores` byte format §6.2 with class order [null, coref, subset_ij,
subset_ji].  The O(M²) pair loop of the reference becomes image-centric
jit batches (icl.data.imagebatch).
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from icl import runtime
from icl.cli._common import (base_parser, default_model_dir,
                             default_scores_path, dump_run_config,
                             load_embeddings)
from icl.data.imagebatch import RelationBatcher
from icl.data.pairs import RELATION_CLASSES
from icl.data.pipeline import load_relation_dataset
from icl.dist.mesh import replicate, shard_batch, sweep_data_axis_size
from icl.eval.scoredict import ScoreDict
from icl.io.scores import write_scores_sharded
from icl.models.relation import RelationModel
from icl.train import create_train_state, make_relation_train_step
from icl.train.checkpoint import Checkpointer
from icl.train.loop import LoopConfig, run_training
from icl.train.steps import make_relation_predict
from icl.util.log import LOG


def main(argv=None) -> None:
    p = base_parser(
        "relation",
        "4-way mention-pair relation classifier (null/coref/subset_ij/"
        "subset_ji) with a shared BiLSTM caption encoder.")
    p.add_argument("--images_per_batch", type=int, default=64,
                   help="images per device batch (throughput peaks ~128 on "
                        "v5e; small datasets round down fine via padding)")
    p.add_argument("--null_weight", type=float, default=0.3,
                   help="CE weight of the dominant null class (§6.4)")
    p.add_argument("--head_hidden", type=int, default=800)
    p.add_argument("--fused", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas grid-head kernel at predict (auto: TPU only)")
    from icl.cli._common import (apply_precision, bucket_spec,
                                 parse_task_args,
                                 resolve_compute_dtype)
    args = parse_task_args(p, argv, "relation")
    apply_precision(args)
    rt = runtime.init(args.mesh, seed=args.seed,
                      coordinator=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id,
                      compilation_cache_dir=args.compilation_cache_dir)
    emb = load_embeddings(args)
    # frozen w2v features ship in the compute dtype: bit-identical to the
    # model's astype-after-gather (rounding commutes with the gather) and
    # halves the table's HBM footprint under --compute_dtype bf16 (~0.45 GB
    # at GoogleNews scale).  Step time is unchanged on the bench shapes —
    # XLA already fused the convert into the gather pass (r3 trace) — this
    # is a memory/capacity change, not a speed one.
    compute_dtype = resolve_compute_dtype(args)
    table = replicate(jnp.asarray(emb.table, dtype=compute_dtype), rt.mesh)
    ds = load_relation_dataset(args.data_dir, args.data_split, emb)
    LOG.info("relation %s: %d images, %d pairs", args.data_split,
             len(ds.images), ds.num_pairs)

    ipb = args.images_per_batch
    ndev = sweep_data_axis_size(rt.mesh, bool(args.predict))
    if ipb % ndev:
        ipb = ((ipb + ndev - 1) // ndev) * ndev
        LOG.warning("images_per_batch rounded to %d for %d devices", ipb, ndev)
    batcher = RelationBatcher(
        images_per_batch=ipb,
        len_spec=bucket_spec(args, "caption_len", (16, 32, 48)),
        mention_spec=bucket_spec(args, "mentions_per_image", (8, 16, 32)),
        build_grid=bool(args.train), with_ids=not args.train)
    lstm_hidden, head_hidden = args.lstm_hidden_width, args.head_hidden
    if args.predict:
        cfg_path = os.path.join(default_model_dir(args, "relation"),
                                "model_config.json")
        if os.path.exists(cfg_path):
            mc = json.load(open(cfg_path))
            lstm_hidden = mc.get("lstm_hidden", lstm_hidden)
            head_hidden = mc.get("head_hidden", head_hidden)
    import jax
    use_fused = (args.fused == "on" or
                 (args.fused == "auto"
                  and jax.devices()[0].platform == "tpu"))
    model = RelationModel(lstm_hidden=lstm_hidden,
                          head_hidden=head_hidden, dropout=args.dropout,
                          compute_dtype=compute_dtype,
                          fused=use_fused and (bool(args.predict)
                                 or jax.devices()[0].platform == "tpu"
                                 or args.dropout == 0.0))
    b0 = next(iter(batcher.batches(ds)))
    jb0 = {k: jnp.asarray(v) for k, v in b0.arrays.items()}
    state = create_train_state(model, (table, jb0),
                               seed=args.seed, learn_rate=args.learn_rate)
    # commit the (identically-seeded) state to the mesh as replicated global
    # arrays — a multi-process jit rejects process-local inputs, and the
    # explicit placement is what the library-level DP tests always did
    state = replicate(state, rt.mesh)
    model_dir = default_model_dir(args, "relation")

    if args.train:
        step = make_relation_train_step(
            class_weights=[args.null_weight, 1.0, 1.0, 1.0],
            grid_loss=model.fused)

        def make_batches(epoch_rng, skip=0):
            if jax.process_count() > 1:
                # multi-host input sharding: this host pads ONLY the rows
                # its devices hold; the schedule stays globally agreed
                # (rng-deterministic), so hosts stay in lockstep
                from icl.dist.mesh import local_data_rows, shard_batch_local
                rows = local_data_rows(rt.mesh, ipb)
                for b in batcher.batches(ds, rng=epoch_rng, skip=skip,
                                         host_rows=rows):
                    yield (shard_batch_local(b.arrays, rt.mesh, ipb),)
                return
            for b in batcher.batches(ds, rng=epoch_rng, skip=skip):
                jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
                yield (shard_batch(jb, rt.mesh),)

        from icl.train.evalhook import build_eval_hook
        # the train batcher already has build_grid=True/with_ids=False and
        # is stateless aside from the per-image pad cache — share it
        eval_fn = build_eval_hook(
            args, model, table, rt.mesh,
            lambda d, sp: load_relation_dataset(d, sp, emb),
            batcher, class_weights=[args.null_weight, 1.0, 1.0, 1.0])
        from icl.dist.mesh import is_main_process
        if is_main_process():
            dump_run_config(args, model_dir)
        cfg = LoopConfig(epochs=args.epochs, ckpt_dir=model_dir,
                         ckpt_every=args.ckpt_every,
                         profile_dir=args.profile_dir, resume=args.resume,
                         metrics_path=args.metrics_file, seed=args.seed,
                         eval_every=args.eval_every,
                         early_stop=args.early_stop, mesh=rt.mesh)
        state = run_training(state, lambda s, b: step(s, table, b),
                             make_batches, cfg, eval_fn=eval_fn)
        if is_main_process():
            with open(os.path.join(model_dir, "model_config.json"), "w") as f:
                json.dump({"task": "relation",
                           "lstm_hidden": args.lstm_hidden_width,
                           "head_hidden": args.head_hidden,
                           "dropout": args.dropout,
                           "compute_dtype": args.compute_dtype}, f)
        LOG.info("trained to step %d; checkpoints in %s",
                 int(state.step), model_dir)
        return

    from icl.cli._common import begin_predict
    ckpt = Checkpointer(model_dir)
    state = ckpt.restore(state)
    if ckpt.latest_step is None:
        LOG.warning("no checkpoint in %s — predicting from init", model_dir)
    # multi-process: this host sweeps images[lo:hi) on a local mesh and the
    # `.scores` shards merge by byte-exact concatenation; floats match a
    # single-host sweep within 1 ulp of %.6f (icl/cli/_common.begin_predict)
    total_pairs = sum(len(im.pair_ids) for im in ds.images)
    pmesh, state, table, (lo, hi) = begin_predict(
        rt, state, table, len(ds.images),
        weights=[len(im.pair_ids) for im in ds.images])
    if (lo, hi) != (0, len(ds.images)):
        import dataclasses
        ds = dataclasses.replace(ds, images=ds.images[lo:hi])
    predict = make_relation_predict(model.apply)
    probs_by_id: dict[str, np.ndarray] = {}
    sd = ScoreDict(labels=list(RELATION_CLASSES))

    def _consume(b, dev_probs):
        probs = np.asarray(dev_probs)
        # one fancy-index copy per batch: per-row views (probs[s, pi])
        # would pin every batch's full probs array for the whole sweep
        # (~0.4 GB at 50k images)
        idx = np.asarray([(s, pi) for s, pi, _ in b.id_index], np.int64
                         ).reshape(-1, 2)
        sel = probs[idx[:, 0], idx[:, 1]]
        preds = sel.argmax(axis=1) if args.eval else None
        labels = b.arrays["pair_label"]
        for k, (s, pi, pid) in enumerate(b.id_index):
            probs_by_id[pid] = sel[k]
            if preds is not None:   # ScoreDict only feeds the --eval table
                sd.increment(RELATION_CLASSES[int(labels[s, pi])],
                             RELATION_CLASSES[int(preds[k])])

    # dispatch-ahead pipeline: batch assembly runs in a prefetch thread and
    # several predicts stay in flight before the oldest result is pulled to
    # host, so the host↔device roundtrip (≈30 ms through a relay, µs
    # co-located) overlaps device compute AND host padding instead of
    # serializing with them
    import collections

    from icl.train.loop import prefetch
    pending: collections.deque = collections.deque()
    for b in prefetch(batcher.batches(ds), depth=4):
        jb = shard_batch({k: jnp.asarray(v) for k, v in b.arrays.items()},
                         pmesh)
        pending.append((b, predict(state.params, table, jb)))
        if len(pending) > 3:
            _consume(*pending.popleft())
    while pending:
        _consume(*pending.popleft())
    if args.oracle_parity or args.oracle_parity_full:
        import jax
        from icl.cli._common import report_parity
        from icl.eval.oracle import oracle_relation
        max_diff, checked = 0.0, 0
        params_np = jax.tree.map(np.asarray, state.params)
        for b in batcher.batches(ds):
            jb = shard_batch({k: jnp.asarray(v) for k, v in b.arrays.items()},
                             pmesh)
            p_jax = np.asarray(predict(state.params, table, jb))
            p_oracle = oracle_relation(params_np, emb.table, b.arrays)
            valid = b.arrays["pair_valid"]
            max_diff = max(max_diff,
                           float(np.abs(p_jax[valid] - p_oracle[valid]).max()))
            checked += 1
            if not args.oracle_parity_full and checked >= 2:
                break
        if checked:
            report_parity(max_diff)
        else:
            # empty sharded-predict slice: nothing was compared — don't
            # print a synthetic PASS (host-local, no barrier involved)
            print("oracle-parity SKIPPED: empty predict slice")
    order = [pid for im in ds.images for pid in im.pair_ids]
    out = (np.stack([probs_by_id[pid] for pid in order]) if order
           else np.zeros((0, len(RELATION_CLASSES))))
    scores_path = default_scores_path(args, "relation")
    write_scores_sharded(scores_path, order, out,
                         num_classes=len(RELATION_CLASSES),
                         total_examples=total_pairs,
                         class_order=RELATION_CLASSES,
                         meta={"task": "relation", "split": args.data_split,
                               "checkpoint_step": int(state.step)})
    LOG.info("wrote %d scores (%d total) to %s", len(order), total_pairs,
             scores_path)
    if args.eval:
        # multi-process: each host counted its own image slice; the merged
        # table equals the single-process one (counts are additive) and only
        # process 0 prints it
        from icl.eval.scoredict import merge_sharded
        merged = merge_sharded(sd, scores_path)
        if merged is not None:
            print(merged.table())


if __name__ == "__main__":
    main()
