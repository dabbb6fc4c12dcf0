"""icl-baseline e2e (component C13): train → predict → valid .scores."""

import os

import numpy as np

from icl.io.scores import read_scores


def test_baseline_train_predict_scores(synth_dir, tmp_path):
    from icl.cli import baseline

    model_file = str(tmp_path / "nv.logistic.pkl")
    scores_file = str(tmp_path / "train.nonvisual.scores")
    baseline.main(["--task", "nonvisual", "--train",
                   "--data_dir", synth_dir, "--model_file", model_file])
    assert os.path.exists(model_file)
    baseline.main(["--task", "nonvisual", "--predict",
                   "--data_dir", synth_dir, "--model_file", model_file,
                   "--scores_file", scores_file, "--eval"])
    ids, probs = read_scores(scores_file)
    assert probs.shape[1] == 2            # [visual, nonvisual]
    assert len(ids) == probs.shape[0] > 0
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-4)
    # the baseline consumes the SAME .feats and emits the SAME .scores
    # format as the neural path — interchangeable for the Java ILP
    for eid in ids[:3]:
        assert eid.startswith("doc:")
