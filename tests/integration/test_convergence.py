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
