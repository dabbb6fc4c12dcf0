"""docs/MIGRATION.md fidelity: the worked example's command sequence must
run as documented (train with in-training eval + checkpoints, predict with
parity audit + ScoreDict table, joint one-pass inference, data linting) —
a docs-rot guard for the switching-user path."""

import os

import pytest

from icl.testing import SynthConfig, generate_dataset


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("mig"))
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=31))
    generate_dataset(d, "dev", SynthConfig(num_images=2, seed=32))
    return d


def test_worked_example_sequence(data_dir, capsys):
    from icl.cli import check as check_cli
    from icl.cli import joint as joint_cli
    from icl.cli import relation as rel_cli

    # 0. (migration guide addition) lint the handoff first
    check_cli.main(["--data_dir", data_dir, "--data_split", "train"])

    # 2. train the relation model with in-training dev eval + checkpoints
    rel_cli.main(["--train", "--data_dir", data_dir, "--epochs", "2",
                  "--eval_every", "2", "--eval_batches", "1",
                  "--ckpt_every", "2", "--resume", "auto"])
    assert os.path.exists(os.path.join(data_dir, "relation.model",
                                       "model_config.json"))

    # 3. write dev .scores for the Java ILP, with parity audit + P/R/F1
    rel_cli.main(["--predict", "--data_dir", data_dir,
                  "--data_split", "dev", "--eval", "--oracle-parity"])
    out = capsys.readouterr().out
    assert "oracle-parity PASS" in out
    assert "Accuracy:" in out
    scores = os.path.join(data_dir, "dev.relation.scores")
    assert os.path.exists(scores)
    first = open(scores).readline()
    assert first.startswith("doc:") and first.count(",") == 4   # §6.2

    # resume=auto on a finished run is a no-op restart, not a retrain
    rel_cli.main(["--train", "--data_dir", data_dir, "--epochs", "2",
                  "--resume", "auto"])

    # 4. produce ALL ILP inputs in one pass (needs the other models too)
    from icl.cli import affinity as aff_cli
    from icl.cli import nonvisual as nv_cli
    nv_cli.main(["--train", "--data_dir", data_dir, "--epochs", "1"])
    aff_cli.main(["--train", "--data_dir", data_dir, "--epochs", "1"])
    joint_cli.main(["--predict", "--data_dir", data_dir,
                    "--data_split", "dev", "--with_rank"])
    for f in ("dev.nonvisual.scores", "dev.relation.scores",
              "dev.affinity.scores", "dev.affinity.rank"):
        assert os.path.exists(os.path.join(data_dir, f)), f

    # the produced scores pass the §6.2 linter
    check_cli.main(["--scores", os.path.join(data_dir, "dev.relation.scores"),
                    "--task", "relation", "--strict"])
