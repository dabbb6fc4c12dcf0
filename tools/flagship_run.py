"""Flagship composed quality run at MSCOCO scale (VERDICT r4 missing#2).

The reference's entire empirical method was "train to convergence, then
ScoreDict on dev" (SURVEY §7.1).  The unit/convergence gates train 96-128
tiny images; `tools/scale_rehearsal.py` trains 500 steps with no quality
readout.  This tool runs the whole r4 machinery TOGETHER in one
production-shaped job, through the real CLIs:

1. a PLANTED-STRUCTURE 50k-image split (the skewed-class regime of SURVEY
   §6.4: ~0.9 null mass via ``planted_active_words`` scaled to the vocab),
2. `icl-relation --train` at production dims (lstm 200 / head 800), bf16
   fused kernels, the production ``--null_weight 0.3``, with
   ``--eval_every`` + ``--early_stop`` (restore-best) + ``--ckpt_every``
   (async-overlapped saves) all live at once,
3. `icl-relation --predict` over the dev split (the mesh predict path —
   one chip here; the multi-process sharded variant is timed separately in
   tools/sharded_predict_bench.py),
4. `icl-eval` — the pinned ScoreDict table on dev.

Emits one JSON summary (stop step, best dev loss, dev accuracy + minority
macro-F1/recall, phase walls, save count, peak RSS) and prints the
ScoreDict table.  Results land in BENCHMARKS.md "Flagship run"; the
regression gate lives in tests/integration/test_flagship_gate.py (scaled
images, pinned minority-F1 floor).

Run on the TPU host::

    python3 tools/flagship_run.py --images 50000 --dev_images 2000

Class-mass arithmetic for the default dims (vocab 400 → entity words drawn
from the lower 200; ``--active_words 64``): a visual pair is non-null iff
both head words fall below 64, P ≈ (64/200)² for cross-entity pairs and
64/200 for same-entity (coref) pairs → ≈0.90 null / 0.05 coref / ~0.05
subsets, the reference data's regime.
"""

from __future__ import annotations

import argparse
import contextlib
import io
import json
import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def peak_rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def ensure_planted(data_dir: str, images: int, dev_images: int,
                   active: int) -> float:
    from icl.testing.synth import SynthConfig, generate_dataset

    marker = os.path.join(data_dir, ".flagship.done")
    key = f"{images}/{dev_images}/{active}"
    if os.path.exists(marker) and open(marker).read().strip() == key:
        return 0.0
    t0 = time.perf_counter()
    os.makedirs(data_dir, exist_ok=True)
    cfg = dict(captions_per_image=5, vocab_size=400, emb_dim=300,
               max_mentions_per_caption=3, max_boxes_per_image=6,
               planted=True, planted_active_words=active)
    generate_dataset(data_dir, "train",
                     SynthConfig(num_images=images, seed=0, **cfg))
    generate_dataset(data_dir, "dev",
                     SynthConfig(num_images=dev_images, seed=0, **cfg))
    with open(marker, "w") as f:
        f.write(key)
    return time.perf_counter() - t0


def run_flagship(data_dir: str, work_dir: str, *, images: int,
                 dev_images: int, active: int, ipb: int, epochs: int,
                 eval_every: int, eval_batches: int, early_stop: int,
                 ckpt_every: int, seed: int, compute_dtype: str,
                 learn_rate: float, lstm_hidden: int = 200,
                 head_hidden: int = 800, dropout: float = 0.5) -> dict:
    """The composed job; returns the JSON summary dict (also printed by
    main()).  Importable so the gated regression test runs the IDENTICAL
    composition at reduced scale."""
    from icl.cli import evaluate, relation
    from icl.eval.scoredict import ScoreDict
    from icl.io.feats import read_feats_labels
    from icl.io.scores import read_scores
    from icl.models.relation import RELATION_CLASSES

    out: dict = {"images": images, "dev_images": dev_images,
                 "active_words": active, "ipb": ipb,
                 "compute_dtype": compute_dtype}
    out["gen_time_s"] = round(
        ensure_planted(data_dir, images, dev_images, active), 1)

    os.makedirs(work_dir, exist_ok=True)
    model_dir = os.path.join(work_dir, "flagship.model")
    metrics = os.path.join(work_dir, "flagship.jsonl")
    scores = os.path.join(work_dir, "flagship.dev.scores")
    common = ["--data_dir", data_dir, "--model_file", model_dir,
              "--images_per_batch", str(ipb), "--compute_dtype",
              compute_dtype]

    t0 = time.perf_counter()
    relation.main(["--train", "--data_split", "train",
                   "--epochs", str(epochs),
                   "--lstm_hidden_width", str(lstm_hidden),
                   "--head_hidden", str(head_hidden),
                   "--dropout", str(dropout),
                   "--learn_rate", str(learn_rate),
                   "--null_weight", "0.3", "--seed", str(seed),
                   "--eval_every", str(eval_every),
                   "--eval_batches", str(eval_batches),
                   "--early_stop", str(early_stop),
                   "--ckpt_every", str(ckpt_every),
                   "--metrics_file", metrics, *common])
    out["train_wall_s"] = round(time.perf_counter() - t0, 1)

    rows = [json.loads(l) for l in open(metrics)]
    evals = [r for r in rows if "eval_loss" in r]
    out["evals_run"] = len(evals)
    out["last_step"] = rows[-1]["step"] if rows else None
    if evals:
        best = min(evals, key=lambda r: r["eval_loss"])
        out["best_eval"] = {"step": best["step"],
                            "loss": round(best["eval_loss"], 4),
                            "acc": round(best["eval_acc"], 4)}
        out["early_stopped"] = (len(evals) - 1 - evals.index(best)
                                >= early_stop)
    # after restore-best + tail pruning the latest checkpoint IS the
    # best-eval step the predict sweep below will load
    import orbax.checkpoint as ocp

    with ocp.CheckpointManager(os.path.abspath(model_dir)) as mgr:
        out["restored_step"] = mgr.latest_step()
    out["ckpt_saves"] = (out["last_step"] or 0) // max(ckpt_every, 1) + 1
    # measured loop-visible stall per overlapped save (BENCHMARKS scale
    # table): 32 ms single-process
    out["save_stall_s_arith"] = round(out["ckpt_saves"] * 0.032, 2)

    t0 = time.perf_counter()
    relation.main(["--predict", "--data_split", "dev",
                   "--scores_file", scores, *common])
    out["predict_wall_s"] = round(time.perf_counter() - t0, 1)

    # icl-eval, the production scorer (table to stdout), then the same
    # numbers structured for the summary/gate
    table = io.StringIO()
    with contextlib.redirect_stdout(table):
        evaluate.main(["--task", "relation", "--scores", scores,
                       "--feats", os.path.join(data_dir,
                                               "dev.relation.feats"),
                       "--strict"])
    out["scoredict_table"] = table.getvalue()

    ids, probs = read_scores(scores)
    gids, glabels = read_feats_labels(
        os.path.join(data_dir, "dev.relation.feats"))
    gold = {i: int(l) for i, l in zip(gids, glabels)}
    y = np.array([gold[i] for i in ids])
    preds = probs.argmax(axis=1)
    sd = ScoreDict(labels=list(RELATION_CLASSES))
    sd.increment_all([RELATION_CLASSES[g] for g in y],
                     [RELATION_CLASSES[int(p)] for p in preds])
    minority = [c for c in RELATION_CLASSES if c != "null"]
    out["dev_pairs"] = len(ids)
    out["null_mass"] = round(float((y == 0).mean()), 4)
    out["dev_accuracy"] = round(float((y == preds).mean()), 4)
    out["minority_macro_f1"] = round(
        sum(sd.f1(c) for c in minority) / len(minority), 4)
    out["minority_macro_recall"] = round(
        sum(sd.recall(c) for c in minority) / len(minority), 4)
    out["null_f1"] = round(sd.f1("null"), 4)
    out["peak_rss_mb"] = round(peak_rss_mb(), 0)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default="/tmp/icl_flagship_data")
    ap.add_argument("--work_dir", default="/tmp/icl_flagship_run")
    ap.add_argument("--images", type=int, default=50000)
    ap.add_argument("--dev_images", type=int, default=2000)
    ap.add_argument("--active_words", type=int, default=64)
    ap.add_argument("--images_per_batch", type=int, default=128)
    ap.add_argument("--epochs", type=int, default=15)
    ap.add_argument("--eval_every", type=int, default=200)
    ap.add_argument("--eval_batches", type=int, default=16)
    ap.add_argument("--early_stop", type=int, default=3)
    ap.add_argument("--ckpt_every", type=int, default=500)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--compute_dtype", default="bf16",
                    choices=["f32", "bf16"])
    ap.add_argument("--learn_rate", type=float, default=0.001)
    args = ap.parse_args()

    out = run_flagship(args.data_dir, args.work_dir, images=args.images,
                       dev_images=args.dev_images, active=args.active_words,
                       ipb=args.images_per_batch, epochs=args.epochs,
                       eval_every=args.eval_every,
                       eval_batches=args.eval_batches,
                       early_stop=args.early_stop,
                       ckpt_every=args.ckpt_every, seed=args.seed,
                       compute_dtype=args.compute_dtype,
                       learn_rate=args.learn_rate)
    table = out.pop("scoredict_table")
    sys.stderr.write(table)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
