"""End-task convergence-quality gates (VERDICT r3 weak#1 / missing#3).

Loss-trend tests can pass with a bug that merely *slows* learning; these
gates assert the composed production path — CLI train loop, optimizer,
class weighting, masking, checkpointing, predict sweep, `.scores` write —
actually learns a planted-structure task to a pinned HELD-OUT accuracy.

The planted generator (``SynthConfig(planted=True)``, icl/testing/synth.py)
makes every label a deterministic function of observable features:
relation = word-parity rule over the two span head words, affinity =
(box signature == word % n_boxes), nonvisual = top-half-vocab head word.
Pilot accuracies on these dims (r4): relation f32 0.969 / bf16 0.963,
affinity 0.982, nonvisual 1.00 — gates sit ~3-5 points below pilots to
absorb seed-level variance while still failing on any real learning
regression (a class-weighting or masking bug costs tens of points).

bf16 `--compute_dtype` (the production throughput mode) previously had
zero end-task-quality evidence; here it must land within 4 points of f32.
"""

from __future__ import annotations

import numpy as np
import pytest

from icl.io.feats import read_feats
from icl.io.scores import read_scores


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    from icl.testing import SynthConfig, generate_dataset

    d = tmp_path_factory.mktemp("planted")
    cfg = dict(captions_per_image=3, vocab_size=16, emb_dim=16,
               max_mentions_per_caption=2, max_boxes_per_image=4,
               planted=True)
    generate_dataset(str(d), "train", SynthConfig(num_images=96, seed=1,
                                                  **cfg))
    generate_dataset(str(d), "dev", SynthConfig(num_images=24, seed=1,
                                                **cfg))
    return d


def _dev_accuracy(scores_path, feats_path) -> float:
    ids, probs = read_scores(str(scores_path))
    gold = {ex.example_id: int(ex.label) for ex in read_feats(str(feats_path))}
    y = np.array([gold[i] for i in ids])
    assert len(y) > 90  # the gate must rest on a non-trivial dev set
    return float((y == probs.argmax(axis=1)).mean())


def _grid_cli_acc(cli, task, planted, tmp_path, tag, epochs, extra=()):
    model = tmp_path / f"{tag}.model"
    scores = tmp_path / f"{tag}.scores"
    common = ["--data_dir", str(planted), "--images_per_batch", "16",
              "--mesh", "8", "--model_file", str(model)]
    cli.main(["--train", "--data_split", "train", "--epochs", str(epochs),
              "--lstm_hidden_width", "24", "--head_hidden", "48",
              "--dropout", "0.0", "--seed", "3", "--learn_rate", "0.01",
              *extra, *common])
    cli.main(["--predict", "--data_split", "dev",
              "--scores_file", str(scores), *common])
    return _dev_accuracy(scores, planted / f"dev.{task}.feats")


def test_relation_converges_f32_and_bf16_match(planted, tmp_path):
    from icl.cli import relation

    acc_f32 = _grid_cli_acc(relation, "relation", planted, tmp_path,
                            "rel_f32", epochs=25)
    assert acc_f32 >= 0.93, f"relation f32 dev accuracy {acc_f32:.3f}"
    acc_bf16 = _grid_cli_acc(relation, "relation", planted, tmp_path,
                             "rel_bf16", epochs=25,
                             extra=("--compute_dtype", "bf16"))
    assert acc_bf16 >= 0.90, f"relation bf16 dev accuracy {acc_bf16:.3f}"
    # the throughput mode must not silently cost model quality
    assert abs(acc_f32 - acc_bf16) <= 0.04, (acc_f32, acc_bf16)


@pytest.fixture(scope="module")
def planted_skew(tmp_path_factory):
    """Skewed-class planted relations: ~0.90 null / 0.06 coref / ~0.02+0.02
    subsets (SURVEY §6.4's regime), via SynthConfig.planted_active_words."""
    from icl.testing import SynthConfig, generate_dataset

    d = tmp_path_factory.mktemp("planted_skew")
    cfg = dict(captions_per_image=5, vocab_size=16, emb_dim=16,
               max_mentions_per_caption=2, max_boxes_per_image=4,
               planted=True, planted_active_words=3)
    generate_dataset(str(d), "train", SynthConfig(num_images=128, seed=1,
                                                  **cfg))
    generate_dataset(str(d), "dev", SynthConfig(num_images=48, seed=1,
                                                **cfg))
    return d


def _relation_scoredict(scores_path, feats_path):
    from icl.eval.scoredict import ScoreDict
    from icl.models.relation import RELATION_CLASSES

    ids, probs = read_scores(str(scores_path))
    gold = {ex.example_id: int(ex.label) for ex in read_feats(str(feats_path))}
    sd = ScoreDict(labels=list(RELATION_CLASSES))
    sd.increment_all([RELATION_CLASSES[gold[i]] for i in ids],
                     [RELATION_CLASSES[int(p)] for p in probs.argmax(1)])
    return sd


def test_relation_skewed_classes_need_weighting(planted_skew, tmp_path):
    """Class-weighted CE at realistic skew (VERDICT r4 weak#2): the
    near-balanced planted gate cannot catch a class-weighting bug, because
    accuracy is trivially ~0.9 by predicting null.  At ~0.9 null mass and a
    3-epoch budget the production ``--null_weight 0.3`` recalls the
    minority classes (macro recall ≥ 0.65 across piloted seeds: 0.758 /
    0.888 / 0.772 / 0.849) while unweighted CE sits at the null prior
    (macro recall ≤ 0.46 in the same pilots) — so the gate FAILS when
    weighting is disabled, and the contrast assertion keeps it honest if
    a future change lets unweighted CE catch up (re-tighten the budget
    then).  Gates F1/recall through ScoreDict, not accuracy."""
    from icl.cli import relation
    from icl.models.relation import RELATION_CLASSES

    minority = [c for c in RELATION_CLASSES if c != "null"]

    def run(tag, null_weight):
        model = tmp_path / f"{tag}.model"
        scores = tmp_path / f"{tag}.scores"
        common = ["--data_dir", str(planted_skew), "--images_per_batch",
                  "16", "--mesh", "8", "--model_file", str(model)]
        relation.main(["--train", "--data_split", "train", "--epochs", "3",
                       "--lstm_hidden_width", "24", "--head_hidden", "48",
                       "--dropout", "0.0", "--seed", "3",
                       "--learn_rate", "0.01",
                       "--null_weight", str(null_weight), *common])
        relation.main(["--predict", "--data_split", "dev",
                       "--scores_file", str(scores), *common])
        sd = _relation_scoredict(scores,
                                 planted_skew / "dev.relation.feats")
        rec = sum(sd.recall(c) for c in minority) / len(minority)
        f1 = sum(sd.f1(c) for c in minority) / len(minority)
        return sd, rec, f1

    sd_w, rec_w, f1_w = run("rel_weighted", 0.3)
    assert sum(sd_w.gold_count(c) for c in minority) >= 100
    assert rec_w >= 0.65, f"weighted minority macro-recall {rec_w:.3f}"
    assert f1_w >= 0.55, f"weighted minority macro-F1 {f1_w:.3f}"
    assert sd_w.f1("null") >= 0.93, sd_w.table()
    # disabling the weighting must lose the minority classes — the
    # property this gate exists to protect
    _, rec_u, _ = run("rel_unweighted", 1.0)
    assert rec_w - rec_u >= 0.10, (rec_w, rec_u)


def test_affinity_converges(planted, tmp_path):
    from icl.cli import affinity

    acc = _grid_cli_acc(affinity, "affinity", planted, tmp_path,
                        "aff", epochs=20)
    assert acc >= 0.95, f"affinity dev accuracy {acc:.3f}"


def _mention_cli_acc(cli, task, planted, tmp_path, epochs):
    model = tmp_path / f"{task}.model"
    scores = tmp_path / f"{task}.scores"
    common = ["--data_dir", str(planted), "--batch_size", "64",
              "--mesh", "8", "--model_file", str(model)]
    cli.main(["--train", "--data_split", "train", "--epochs", str(epochs),
              "--hidden_width", "32", "--dropout", "0.0",
              "--seed", "3", "--learn_rate", "0.01", *common])
    cli.main(["--predict", "--data_split", "dev",
              "--scores_file", str(scores), *common])
    return _dev_accuracy(scores, planted / f"dev.{task}.feats")


def test_nonvisual_converges(planted, tmp_path):
    from icl.cli import nonvisual

    acc = _mention_cli_acc(nonvisual, "nonvisual", planted, tmp_path,
                           epochs=12)
    assert acc >= 0.98, f"nonvisual dev accuracy {acc:.3f}"


def test_cardinality_converges(planted, tmp_path):
    """Planted label: 0 for nonvisual mentions, else 1 + (head word % 2) —
    a pure function of the mention text, so the 12-class FFNN must nail it
    (completes held-out quality gates for all four task families)."""
    from icl.cli import cardinality

    acc = _mention_cli_acc(cardinality, "cardinality", planted, tmp_path,
                           epochs=12)
    assert acc >= 0.98, f"cardinality dev accuracy {acc:.3f}"
