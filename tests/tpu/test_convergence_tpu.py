"""Convergence gate at PRODUCTION dims on the real chip (VERDICT r3 #3).

tests/integration/test_convergence.py gates held-out accuracy at tiny CPU
dims with the fused kernels off; this variant trains the relation model at
production widths (lstm 200 / head 800) through the fused bf16 train path —
Pallas grid-head custom VJP, in-kernel CE, Mosaic PRNG dropout path off —
and requires the same planted-task accuracy.  A kernel-gradient bug that
preserves loss *trends* but degrades the optimum fails here and nowhere
else.
"""

import jax
import numpy as np
import pytest


def _require_tpu():
    if jax.devices()[0].platform != "tpu":
        pytest.skip("needs a real TPU device")


def _planted(tmp_path):
    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path / "data")
    cfg = dict(captions_per_image=3, vocab_size=16, emb_dim=16,
               max_mentions_per_caption=2, max_boxes_per_image=4,
               planted=True)
    generate_dataset(d, "train", SynthConfig(num_images=96, seed=1, **cfg))
    generate_dataset(d, "dev", SynthConfig(num_images=24, seed=1, **cfg))
    return d


def _dev_acc(scores, feats):
    from icl.io.feats import read_feats
    from icl.io.scores import read_scores

    ids, probs = read_scores(str(scores))
    gold = {ex.example_id: int(ex.label) for ex in read_feats(str(feats))}
    y = np.array([gold[i] for i in ids])
    return float((y == probs.argmax(axis=1)).mean())


def test_relation_bf16_fused_converges_production_dims(tmp_path):
    _require_tpu()
    from icl.cli import relation

    d = _planted(tmp_path)

    model = tmp_path / "rel.model"
    scores = tmp_path / "rel.scores"
    common = ["--data_dir", d, "--images_per_batch", "16",
              "--model_file", str(model)]
    relation.main(["--train", "--data_split", "train", "--epochs", "25",
                   "--lstm_hidden_width", "200", "--head_hidden", "800",
                   "--dropout", "0.0", "--seed", "3",
                   "--learn_rate", "0.01", "--compute_dtype", "bf16",
                   "--fused", "on", *common])
    # f32 predict (parity-grade scores) from the bf16-trained checkpoint
    relation.main(["--predict", "--data_split", "dev",
                   "--scores_file", str(scores), *common])

    acc = _dev_acc(scores, f"{d}/dev.relation.feats")
    assert acc >= 0.93, f"fused bf16 relation dev accuracy {acc:.3f}"


def test_affinity_bf16_fused_converges_production_dims(tmp_path):
    """The second grid family through ITS fused bf16 train path (split-
    weight grid head + in-kernel CE) at production widths on the chip."""
    _require_tpu()
    from icl.cli import affinity

    d = _planted(tmp_path)
    model = tmp_path / "aff.model"
    scores = tmp_path / "aff.scores"
    common = ["--data_dir", d, "--images_per_batch", "16",
              "--model_file", str(model)]
    affinity.main(["--train", "--data_split", "train", "--epochs", "20",
                   "--lstm_hidden_width", "200", "--head_hidden", "800",
                   "--dropout", "0.0", "--seed", "3",
                   "--learn_rate", "0.01", "--compute_dtype", "bf16",
                   "--fused", "on", *common])
    affinity.main(["--predict", "--data_split", "dev",
                   "--scores_file", str(scores), *common])

    acc = _dev_acc(scores, f"{d}/dev.affinity.feats")
    assert acc >= 0.95, f"fused bf16 affinity dev accuracy {acc:.3f}"
