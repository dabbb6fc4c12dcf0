"""icl-check: the §6.1 data-directory linter (grammar + cross-file
referential integrity).  A clean synthetic split passes; each corruption
class is detected with the right severity and exit code."""

import pytest

from icl.cli import check as check_cli
from icl.testing import SynthConfig, generate_dataset


@pytest.fixture
def synth_dir(tmp_path):
    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=3, seed=21))
    return d


def _run(argv):
    check_cli.main(argv)


def test_clean_dir_passes(synth_dir, capsys):
    _run(["--data_dir", synth_dir, "--strict"])
    out = capsys.readouterr().out
    assert "0 error(s), 0 warning(s) — OK" in out


def test_dangling_mention_reference_fails(synth_dir, capsys):
    with open(f"{synth_dir}/train.relation.feats", "a") as f:
        f.write("1 2:1 # doc:ghost.jpg;caption_1:0;mention_1:0"
                ";caption_2:0;mention_2:1\n")
    with pytest.raises(SystemExit):
        _run(["--data_dir", synth_dir, "--task", "relation"])
    assert "reference a mention absent" in capsys.readouterr().out


def test_missing_box_fails(synth_dir, capsys):
    with open(f"{synth_dir}/train.affinity.feats", "a") as f:
        f.write("1 2:1 # doc:train_0000.jpg;caption:0;mention:0;box:999\n")
    with pytest.raises(SystemExit):
        _run(["--data_dir", synth_dir, "--task", "affinity"])
    assert "box absent" in capsys.readouterr().out


def test_label_range_and_duplicate_id(synth_dir, capsys):
    with open(f"{synth_dir}/train.nonvisual.feats") as f:
        first = next(l for l in f if "#" in l)
    with open(f"{synth_dir}/train.nonvisual.feats", "a") as f:
        f.write(first)                       # duplicate id -> warning
        f.write("7 " + first.partition(" ")[2])   # label 7 -> error
    with pytest.raises(SystemExit):
        _run(["--data_dir", synth_dir, "--task", "nonvisual"])
    out = capsys.readouterr().out
    assert "outside the 2-class" in out
    assert "duplicate example id" in out


def test_strict_promotes_warnings(synth_dir, capsys):
    with open(f"{synth_dir}/train.nonvisual.feats") as f:
        first = next(l for l in f if "#" in l)
    with open(f"{synth_dir}/train.nonvisual.feats", "a") as f:
        f.write(first)                       # duplicate id: warning only
    _run(["--data_dir", synth_dir, "--task", "nonvisual"])   # passes
    with pytest.raises(SystemExit):
        _run(["--data_dir", synth_dir, "--task", "nonvisual", "--strict"])


def test_scores_lint_clean_and_bad(tmp_path, capsys):
    from icl.io.scores import write_scores

    p = str(tmp_path / "x.scores")
    write_scores(p, ["a", "b"], [[0.25, 0.75], [0.5, 0.5]],
                 class_order=["visual", "nonvisual"])
    _run(["--scores", p, "--task", "nonvisual", "--strict"])
    assert "0 error(s), 0 warning(s) — OK" in capsys.readouterr().out

    bad = tmp_path / "bad.scores"
    bad.write_text("a,0.5,0.6\nb,0.40,0.612345\na,1.200000,-0.200000\n")
    with pytest.raises(SystemExit):
        _run(["--scores", str(bad), "--task", "nonvisual"])
    out = capsys.readouterr().out
    assert "outside [0, 1]" in out
    assert "duplicate example id" in out
    assert "not 6-decimal fixed format" in out


def test_scores_lint_class_count_and_meta(tmp_path, capsys):
    import json

    p = tmp_path / "x.scores"
    p.write_text("a,0.300000,0.700000\n")
    with pytest.raises(SystemExit):
        _run(["--scores", str(p), "--task", "relation"])   # wants 4 classes
    assert "but relation has 4 classes" in capsys.readouterr().out
    (tmp_path / "x.scores.meta.json").write_text(
        json.dumps({"class_order": ["a", "b", "c"]}))
    with pytest.raises(SystemExit):
        _run(["--scores", str(p), "--task", "nonvisual"])
    assert "3 entries but the file has 2 columns" in capsys.readouterr().out


def test_bad_grammar_and_clipped_span(synth_dir, capsys):
    with open(f"{synth_dir}/train.cardinality.feats", "a") as f:
        f.write("1 2:1 # not-an-id\n")
    with open(f"{synth_dir}/train.mentions.txt", "a") as f:
        f.write("doc:train_0000.jpg;caption:0;mention:99\t500,900\tx\n")
    with pytest.raises(SystemExit):
        _run(["--data_dir", synth_dir, "--task", "cardinality"])
    out = capsys.readouterr().out
    assert "violate the cardinality grammar" in out
    assert "extend past their caption length" in out


def test_duplicate_box_id_warns(synth_dir, capsys):
    import numpy as np

    from icl.io.boxes import read_box_feats, write_box_feats

    path = f"{synth_dir}/train.boxes.npz"
    ids, feats = read_box_feats(path)
    ids = list(ids) + [ids[0]]                    # same id, new features
    feats = np.vstack([feats, feats[:1] + 1.0])
    write_box_feats(path, ids, feats)
    _run(["--data_dir", synth_dir, "--task", "affinity"])  # warning only
    out = capsys.readouterr().out
    assert "duplicate box id" in out and "LAST occurrence" in out
    with pytest.raises(SystemExit):              # --strict promotes it
        _run(["--data_dir", synth_dir, "--task", "affinity", "--strict"])
