"""icl-affinity — phrase↔box affinity scorer CLI (SURVEY §4.3, §6.5).

Reference parity: mirrors ``icl_affinity.py``; `.scores` per (mention, box)
cell with class order [no_affinity, affinity].  The per-pair concat loop of
the reference becomes two GEMMs + broadcast-add over image grids.
"""

from __future__ import annotations

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from icl import runtime
from icl.cli._common import (base_parser, default_model_dir,
                             default_scores_path, dump_run_config,
                             load_embeddings)
from icl.data.imagebatch import AffinityBatcher
from icl.data.pipeline import load_affinity_dataset
from icl.dist.mesh import replicate, shard_batch, sweep_data_axis_size
from icl.eval.scoredict import ScoreDict
from icl.io.scores import write_scores_sharded
from icl.models.affinity import AFFINITY_CLASSES, AffinityModel
from icl.train import create_train_state, make_affinity_train_step
from icl.train.checkpoint import Checkpointer
from icl.train.loop import LoopConfig, run_training
from icl.train.steps import make_affinity_predict
from icl.util.log import LOG


def main(argv=None) -> None:
    p = base_parser(
        "affinity",
        "Phrase-box affinity scorer: LSTM phrase embeddings x VGG fc7 box "
        "features, batched GEMM + per-image softmax.")
    p.add_argument("--images_per_batch", type=int, default=64,
                   help="images per device batch (throughput peaks ~128 on "
                        "v5e; small datasets round down fine via padding)")
    p.add_argument("--head_hidden", type=int, default=1024)
    p.add_argument("--fused", default="auto",
                   choices=["auto", "on", "off"],
                   help="Pallas grid-head kernel at predict (auto: TPU only)")
    p.add_argument("--rank_file", default=None,
                   help="with --predict: also write per-image box-ranking "
                        "distributions (softmax over candidate boxes per "
                        "mention, SURVEY §6.5 inference extra) to this path")
    p.add_argument("--phrase_enc", default="lstm",
                   choices=["lstm", "mean_w2v"])
    from icl.cli._common import (apply_precision, bucket_spec,
                                 parse_task_args,
                                 resolve_compute_dtype)
    args = parse_task_args(p, argv, "affinity")
    apply_precision(args)
    rt = runtime.init(args.mesh, seed=args.seed,
                      coordinator=args.coordinator,
                      num_processes=args.num_processes,
                      process_id=args.process_id,
                      compilation_cache_dir=args.compilation_cache_dir)
    emb = load_embeddings(args)
    # frozen w2v table ships in compute dtype (bit-identical to the model's
    # former per-step astype-after-gather; see icl/cli/relation.py note)
    compute_dtype = resolve_compute_dtype(args)
    table = replicate(jnp.asarray(emb.table, dtype=compute_dtype), rt.mesh)
    ds = load_affinity_dataset(args.data_dir, args.data_split, emb)
    LOG.info("affinity %s: %d images, %d cells", args.data_split,
             len(ds.images), ds.num_cells)

    ipb = args.images_per_batch
    ndev = sweep_data_axis_size(rt.mesh, bool(args.predict))
    if ipb % ndev:
        ipb = ((ipb + ndev - 1) // ndev) * ndev
        LOG.warning("images_per_batch rounded to %d for %d devices", ipb, ndev)
    import jax.numpy as _jnp
    if compute_dtype == _jnp.bfloat16:
        import ml_dtypes
        box_np_dtype = ml_dtypes.bfloat16
    else:
        box_np_dtype = np.float32
    batcher = AffinityBatcher(
        images_per_batch=ipb,
        mention_spec=bucket_spec(args, "mentions_per_image", (8, 16, 32)),
        box_spec=bucket_spec(args, "boxes_per_image", (8, 16, 32)),
        box_dtype=box_np_dtype, with_ids=not args.train)
    lstm_hidden, head_hidden = args.lstm_hidden_width, args.head_hidden
    phrase_enc = args.phrase_enc
    if args.predict:
        cfg_path = os.path.join(default_model_dir(args, "affinity"),
                                "model_config.json")
        if os.path.exists(cfg_path):
            mc = json.load(open(cfg_path))
            lstm_hidden = mc.get("lstm_hidden", lstm_hidden)
            head_hidden = mc.get("head_hidden", head_hidden)
            phrase_enc = mc.get("phrase_enc", phrase_enc)
    import jax
    use_fused = (args.fused == "on" or
                 (args.fused == "auto"
                  and jax.devices()[0].platform == "tpu"))
    model = AffinityModel(lstm_hidden=lstm_hidden,
                          head_hidden=head_hidden, dropout=args.dropout,
                          phrase_enc=phrase_enc,
                          compute_dtype=compute_dtype,
                          fused=use_fused and (bool(args.predict)
                                 or jax.devices()[0].platform == "tpu"
                                 or args.dropout == 0.0))
    b0 = next(iter(batcher.batches(ds)))
    jb0 = {k: jnp.asarray(v) for k, v in b0.arrays.items()}
    state = create_train_state(model, (table, jb0),
                               seed=args.seed, learn_rate=args.learn_rate)
    # committed replicated placement (see icl/cli/relation.py)
    state = replicate(state, rt.mesh)
    model_dir = default_model_dir(args, "affinity")

    if args.train:
        step = make_affinity_train_step(grid_loss=model.fused)

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
        eval_fn = build_eval_hook(
            args, model, table, rt.mesh,
            lambda d, sp: load_affinity_dataset(d, sp, emb),
            batcher)
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
                json.dump({"task": "affinity",
                           "lstm_hidden": args.lstm_hidden_width,
                           "head_hidden": args.head_hidden,
                           "dropout": args.dropout,
                           "phrase_enc": args.phrase_enc,
                           "compute_dtype": args.compute_dtype,
                           "box_dim": ds.box_dim}, f)
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
    total_cells = ds.num_cells
    pmesh, state, table, (lo, hi) = begin_predict(
        rt, state, table, len(ds.images),
        weights=[int(im.grid_valid.sum()) for im in ds.images])
    if (lo, hi) != (0, len(ds.images)):
        import dataclasses
        ds = dataclasses.replace(ds, images=ds.images[lo:hi])
    predict = make_affinity_predict(model.apply)
    probs_by_id: dict[str, np.ndarray] = {}
    sd = ScoreDict(labels=list(AFFINITY_CLASSES))
    from icl.models.affinity import rank_boxes
    rank_by_id: dict[str, float] = {}

    want_rank = bool(args.rank_file)

    @jax.jit
    def packed_fn(p, t, bb):
        """One fused device program → ONE host fetch per batch: softmax
        probs and (when ranking) the per-image box-ranking distribution
        ride in a single [I,M,B,2(+1)] array — the separate rank fetch
        used to cost a second full relay roundtrip per batch."""
        logits = model.apply({"params": p}, t, bb, deterministic=True)
        probs = jax.nn.softmax(logits, axis=-1)
        if not want_rank:
            return probs
        rank = rank_boxes(logits, bb["box_valid"])
        return jnp.concatenate([probs, rank[..., None]], axis=-1)

    def _consume(b, dev_packed):
        packed = np.asarray(dev_packed)               # [I,M,B,2(+rank)]
        B = packed.shape[2]
        # one fancy-index copy per batch (per-cell views would pin every
        # batch's packed array for the whole sweep — see relation.py)
        idx = np.asarray([(s, *divmod(cell, B))
                          for s, cell, _ in b.id_index], np.int64
                         ).reshape(-1, 3)
        sel = packed[idx[:, 0], idx[:, 1], idx[:, 2]]
        preds = sel[:, :2].argmax(axis=1) if args.eval else None
        labels = b.arrays["grid_label"]
        for k, (s, cell, cid) in enumerate(b.id_index):
            probs_by_id[cid] = sel[k, :2]
            if want_rank:
                rank_by_id[cid] = float(sel[k, 2])
            if preds is not None:   # ScoreDict only feeds the --eval table
                r, c = idx[k, 1], idx[k, 2]
                sd.increment(AFFINITY_CLASSES[int(labels[s, r, c])],
                             AFFINITY_CLASSES[int(preds[k])])

    # dispatch-ahead pipeline (see icl/cli/relation.py): batch assembly in
    # a prefetch thread + several predicts in flight before the oldest
    # result is pulled to host
    import collections

    from icl.train.loop import prefetch
    pending: collections.deque = collections.deque()
    for b in prefetch(batcher.batches(ds), depth=4):
        jb = shard_batch({k: jnp.asarray(v) for k, v in b.arrays.items()},
                         pmesh)
        pending.append((b, packed_fn(state.params, table, jb)))
        if len(pending) > 3:
            _consume(*pending.popleft())
    while pending:
        _consume(*pending.popleft())
    if args.oracle_parity or args.oracle_parity_full:
        import jax
        from icl.cli._common import report_parity
        from icl.eval.oracle import oracle_affinity
        max_diff, checked = 0.0, 0
        params_np = jax.tree.map(np.asarray, state.params)
        for b in batcher.batches(ds):
            jb = shard_batch({k: jnp.asarray(v) for k, v in b.arrays.items()},
                             pmesh)
            p_jax = np.asarray(predict(state.params, table, jb))
            p_oracle = oracle_affinity(params_np, emb.table, b.arrays,
                                       phrase_enc=phrase_enc)
            valid = b.arrays["grid_valid"]
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
    # write in dataset order: per image, mention-major over valid cells
    from icl.io.captions import parse_mention_id
    order = []
    for im in ds.images:
        for r, mid in enumerate(im.mention_ids):
            img, ci, mi = parse_mention_id(mid)
            for c, bi in enumerate(im.box_idx):
                if im.grid_valid[r, c]:
                    order.append(im.cell_id(ci, mi, bi))
    out = (np.stack([probs_by_id[cid] for cid in order]) if order
           else np.zeros((0, len(AFFINITY_CLASSES))))
    scores_path = default_scores_path(args, "affinity")
    write_scores_sharded(scores_path, order, out,
                         num_classes=len(AFFINITY_CLASSES),
                         total_examples=total_cells,
                         class_order=AFFINITY_CLASSES,
                         meta={"task": "affinity", "split": args.data_split,
                               "checkpoint_step": int(state.step)})
    LOG.info("wrote %d scores (%d total) to %s", len(order), total_cells,
             scores_path)
    if args.rank_file:
        ranks_out = np.array([[rank_by_id[cid]] for cid in order]
                             ).reshape(len(order), 1)
        write_scores_sharded(
            args.rank_file, order, ranks_out, num_classes=1,
            total_examples=total_cells, class_order=["rank_prob"],
            meta={"task": "affinity_rank", "split": args.data_split,
                  "note": "per-image softmax over candidate boxes "
                          "per mention (SURVEY §6.5)"})
        LOG.info("wrote %d rank probs to %s", len(order), args.rank_file)
    if args.eval:
        # sharded --eval: merged counts ≡ single-process (see relation.py)
        from icl.eval.scoredict import merge_sharded
        merged = merge_sharded(sd, scores_path)
        if merged is not None:
            print(merged.table())


if __name__ == "__main__":
    main()
