"""E2E joint inference (BASELINE configs[3]): one invocation → all .scores."""

import os

from icl.io.scores import read_scores


def test_joint_after_training(tmp_path):
    from icl.testing.synth import SynthConfig, generate_dataset
    from icl.cli import affinity, joint, nonvisual, relation

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=5, seed=21))
    generate_dataset(d, "dev", SynthConfig(num_images=2, seed=22))
    small = ["--lstm_hidden_width", "8", "--images_per_batch", "2"]
    nonvisual.main(["--train", "--data_dir", d, "--epochs", "2",
                    "--batch_size", "32", "--hidden_width", "16"])
    relation.main(["--train", "--data_dir", d, "--epochs", "1",
                   "--head_hidden", "16", *small])
    affinity.main(["--train", "--data_dir", d, "--epochs", "1",
                   "--head_hidden", "16", *small])

    joint.main(["--predict", "--data_dir", d, "--data_split", "dev",
                "--images_per_batch", "2", "--with_rank"])
    for task, ncols in (("nonvisual", 2), ("relation", 4), ("affinity", 2)):
        ids, probs = read_scores(os.path.join(d, f"dev.{task}.scores"))
        assert len(ids) > 0 and probs.shape[1] == ncols
    # --with_rank: per-image box-ranking distributions alongside the scores
    rids, ranks = read_scores(os.path.join(d, "dev.affinity.rank"))
    assert len(rids) > 0 and ranks.shape[1] == 1
    assert (ranks >= 0).all() and (ranks <= 1).all()


def test_joint_rejects_unsupported_flags(tmp_path):
    """Flags icl-joint cannot honor hard-error instead of parsing fine and
    doing nothing (r3 review: --config/--model_file/--scores_file)."""
    import pytest

    from icl.cli.joint import main as jmain

    for extra in (["--config", str(tmp_path / "c.json")],
                  ["--model_file", str(tmp_path / "m")],
                  ["--scores_file", str(tmp_path / "s.scores")]):
        with pytest.raises(SystemExit):
            jmain(["--predict", "--data_dir", str(tmp_path)] + extra)
