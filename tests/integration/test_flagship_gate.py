"""Regression gate for the composed flagship-quality job (VERDICT r4
missing#2).

`tools/flagship_run.py` ran the reference's empirical loop — train to a
plateau, ScoreDict on dev (SURVEY §7.1) — at 50k scale on the real chip
(BENCHMARKS.md "Flagship run": dev accuracy 99.96%, minority macro-F1
0.992 at 0.902 null mass).  This test executes the IDENTICAL composition
(same `run_flagship` entry: planted skewed-class data → CLI train with
eval hook + early-stop config + periodic checkpoints → best-step predict
sweep → strict `icl-eval` → ScoreDict) at reduced scale and pins quality
floors, so a regression in ANY composed piece — class weighting, bf16
kernels, eval-hook lockstep, checkpoint restore, `.scores` round-trip,
scorer join — fails loudly here instead of only at the next 50k run.

Pilots at these dims (seeds 7 / 3): minority macro-F1 0.817 / 0.829,
accuracy 0.988 / 0.988 — gates sit well below pilots for seed headroom
while still far above the skew prior (predict-all-null = accuracy 0.90,
minority F1 0.0).
"""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def flagship_out(tmp_path_factory):
    from tools.flagship_run import run_flagship

    work = tmp_path_factory.mktemp("flagship_gate")
    return run_flagship(str(work / "data"), str(work / "run"),
                        images=1200, dev_images=300, active=64, ipb=32,
                        epochs=3, eval_every=15, eval_batches=8,
                        early_stop=3, ckpt_every=40, seed=7,
                        compute_dtype="bf16", learn_rate=0.005,
                        lstm_hidden=48, head_hidden=96, dropout=0.0)


def test_flagship_composition_quality(flagship_out):
    out = flagship_out
    # the planted skew landed in the reference regime (SURVEY §6.4)
    assert 0.85 <= out["null_mass"] <= 0.95, out["null_mass"]
    assert out["dev_pairs"] > 10000
    # quality floors (pilot 0.82-0.83 minority F1 / 0.988 accuracy)
    assert out["dev_accuracy"] >= 0.96, out
    assert out["minority_macro_f1"] >= 0.70, out
    assert out["minority_macro_recall"] >= 0.65, out
    assert out["null_f1"] >= 0.98, out


def test_flagship_composition_machinery(flagship_out):
    out = flagship_out
    # every subsystem actually ran: dev evals fired on schedule, periodic
    # checkpoints happened, predict restored a real step, the strict
    # icl-eval join produced the pinned table
    assert out["evals_run"] >= 5, out
    assert out["ckpt_saves"] >= 2, out
    assert out["restored_step"] is not None
    assert "Accuracy:" in out["scoredict_table"]
    assert out["best_eval"]["loss"] < 0.3, out["best_eval"]
