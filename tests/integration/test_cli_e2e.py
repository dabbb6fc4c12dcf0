"""E2E tiny runs per task through the real CLI mains (SURVEY §7.4).

.feats → train → checkpoint → predict → .scores → format validity, on CPU.
"""

import json
import os

import numpy as np
import pytest

from icl.io.scores import read_scores


@pytest.fixture(scope="module")
def cli_dir(tmp_path_factory):
    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path_factory.mktemp("cli"))
    generate_dataset(d, "train", SynthConfig(num_images=6, seed=11))
    generate_dataset(d, "dev", SynthConfig(num_images=3, seed=12))
    return d


def _common(d, split="dev"):
    return ["--data_dir", d, "--data_split", split]


def test_nonvisual_cli_e2e(cli_dir, capsys):
    from icl.cli.nonvisual import main
    main(["--train", "--data_dir", cli_dir, "--epochs", "4",
          "--batch_size", "32", "--hidden_width", "16"])
    assert os.path.exists(os.path.join(cli_dir, "nonvisual.model",
                                       "model_config.json"))
    main(["--predict", "--eval", "--hidden_width", "16",
          *_common(cli_dir)])
    out = capsys.readouterr().out
    assert "Accuracy:" in out
    sp = os.path.join(cli_dir, "dev.nonvisual.scores")
    ids, probs = read_scores(sp)
    assert probs.shape[1] == 2
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=2e-6)
    meta = json.load(open(sp + ".meta.json"))
    assert meta["class_order"] == ["visual", "nonvisual"]


def test_relation_cli_e2e(cli_dir):
    from icl.cli.relation import main
    small = ["--lstm_hidden_width", "8", "--head_hidden", "16",
             "--images_per_batch", "2"]
    main(["--train", "--data_dir", cli_dir, "--epochs", "2", *small])
    main(["--predict", *_common(cli_dir), *small])
    sp = os.path.join(cli_dir, "dev.relation.scores")
    ids, probs = read_scores(sp)
    assert probs.shape[1] == 4
    np.testing.assert_allclose(probs.sum(1), 1.0, atol=2e-6)
    # ids follow the relation pair scheme
    assert all(i.startswith("doc:") and ";caption_1:" in i for i in ids)


def test_affinity_cli_e2e(cli_dir):
    from icl.cli.affinity import main
    small = ["--lstm_hidden_width", "8", "--head_hidden", "16",
             "--images_per_batch", "2"]
    main(["--train", "--data_dir", cli_dir, "--epochs", "2", *small])
    main(["--predict", *_common(cli_dir), *small])
    ids, probs = read_scores(os.path.join(cli_dir, "dev.affinity.scores"))
    assert probs.shape[1] == 2
    assert all(";box:" in i for i in ids)


def test_predict_determinism(cli_dir):
    """Bitwise-identical .scores across repeated predicts (SURVEY §7.3)."""
    from icl.cli.nonvisual import main
    s1 = os.path.join(cli_dir, "det1.scores")
    s2 = os.path.join(cli_dir, "det2.scores")
    main(["--predict", *_common(cli_dir), "--hidden_width", "16",
          "--scores_file", s1])
    main(["--predict", *_common(cli_dir), "--hidden_width", "16",
          "--scores_file", s2])
    assert open(s1, "rb").read() == open(s2, "rb").read()


def test_cardinality_cli_e2e(cli_dir):
    from icl.cli.cardinality import main
    main(["--train", "--data_dir", cli_dir, "--epochs", "2",
          "--batch_size", "32", "--hidden_width", "16"])
    main(["--predict", *_common(cli_dir), "--hidden_width", "16"])
    ids, probs = read_scores(os.path.join(cli_dir, "dev.cardinality.scores"))
    assert probs.shape[1] == 12


def test_affinity_rank_file(cli_dir):
    """--rank_file writes per-image box-ranking distributions (SURVEY §6.5)."""
    from collections import defaultdict

    from icl.cli.affinity import main
    rank_path = os.path.join(cli_dir, "dev.affinity.rank.scores")
    main(["--predict", *_common(cli_dir), "--rank_file", rank_path])
    ids, probs = read_scores(rank_path)
    assert probs.shape[1] == 1
    sums = defaultdict(float)
    for i, p in zip(ids, probs[:, 0]):
        sums[i.rsplit(";box:", 1)[0]] += p
    for mention, total in sums.items():
        assert abs(total - 1.0) < 1e-4, (mention, total)


def test_bf16_compute_dtype_cli(cli_dir, tmp_path):
    """--compute_dtype bf16: trains and predicts end-to-end; affinity box
    features ship as bf16 (host-side conversion); checkpoints stay f32 so a
    bf16-trained model predicts in f32 too."""
    from icl.cli.affinity import main as amain
    from icl.cli.relation import main as rmain
    md = str(tmp_path / "rel_bf16")
    small = ["--lstm_hidden_width", "8", "--head_hidden", "16",
             "--images_per_batch", "2", "--model_file", md]
    rmain(["--train", "--data_dir", cli_dir, "--epochs", "1",
           "--compute_dtype", "bf16", *small])
    mc = json.load(open(os.path.join(md, "model_config.json")))
    assert mc["compute_dtype"] == "bf16"
    # bf16-trained checkpoint predicts fine under the default f32 mode
    sp = str(tmp_path / "rel_bf16.scores")
    rmain(["--predict", *_common(cli_dir), *small, "--scores_file", sp])
    ids, probs = read_scores(sp)
    assert probs.shape[1] == 4 and np.isfinite(probs).all()

    amd = str(tmp_path / "aff_bf16")
    asmall = ["--lstm_hidden_width", "8", "--head_hidden", "16",
              "--images_per_batch", "2", "--model_file", amd]
    amain(["--train", "--data_dir", cli_dir, "--epochs", "1",
           "--compute_dtype", "bf16", *asmall])
    asp = str(tmp_path / "aff_bf16.scores")
    amain(["--predict", *_common(cli_dir), *asmall, "--scores_file", asp])
    _, aprobs = read_scores(asp)
    assert np.isfinite(aprobs).all()


def test_affinity_batcher_box_dtype(cli_dir):
    """box_dtype=bfloat16 halves the box block bytes and round-trips values
    at bf16 precision."""
    import ml_dtypes

    from icl.data.imagebatch import AffinityBatcher
    from icl.data.pipeline import load_affinity_dataset
    from icl.data.embeddings import EmbeddingStore

    emb = EmbeddingStore.load(os.path.join(cli_dir, "embeddings.txt"))
    ds = load_affinity_dataset(cli_dir, "dev", emb)
    b16 = next(iter(AffinityBatcher(images_per_batch=2,
                                    box_dtype=ml_dtypes.bfloat16).batches(ds)))
    b32 = next(iter(AffinityBatcher(images_per_batch=2).batches(ds)))
    assert b16.arrays["box_feats"].dtype == ml_dtypes.bfloat16
    assert b16.arrays["box_feats"].nbytes * 2 == b32.arrays["box_feats"].nbytes
    np.testing.assert_allclose(
        b16.arrays["box_feats"].astype(np.float32),
        b32.arrays["box_feats"], rtol=8e-3, atol=1e-2)


def test_eval_cli(capsys, tmp_path):
    """icl-eval scores a .scores file against gold .feats: known inputs give
    a hand-computable accuracy; --strict errors on id mismatches."""
    import pytest

    from icl.cli.evaluate import main as emain

    ids = [f"doc:d.jpg;caption:0;mention:{i}" for i in range(4)]
    sp = str(tmp_path / "x.scores")
    with open(sp, "w") as f:                     # argmax: 1, 0, 1, 1
        for i, row in zip(ids, ["0.1,0.9", "0.8,0.2", "0.3,0.7", "0.4,0.6"]):
            f.write(f"{i},{row}\n")
    fp = str(tmp_path / "x.feats")
    with open(fp, "w") as f:                     # gold:   1, 0, 0, 1
        for i, lab in zip(ids, [1, 0, 0, 1]):
            f.write(f"{lab} 1:1.0 # {i}\n")
    emain(["--task", "nonvisual", "--scores", sp, "--feats", fp])
    out = capsys.readouterr().out
    assert "Accuracy: 75.00%" in out and "F1" in out

    # class-count mismatch is a hard error
    with pytest.raises(SystemExit):
        emain(["--task", "relation", "--scores", sp, "--feats", fp])

    # --strict errors when ids are missing from one side
    short = str(tmp_path / "short.scores")
    with open(sp) as f, open(short, "w") as g:
        g.writelines(f.readlines()[:2])
    emain(["--task", "nonvisual", "--scores", short, "--feats", fp])
    with pytest.raises(SystemExit):
        emain(["--task", "nonvisual", "--scores", short, "--feats", fp,
               "--strict"])


def test_eval_every_hook(cli_dir, tmp_path):
    """--eval_every N: dev loss/acc appears in the metrics JSONL (eval_*
    keys), values finite, for both relation and affinity trains."""
    from icl.cli.affinity import main as amain
    from icl.cli.relation import main as rmain

    for name, main in (("rel", rmain), ("aff", amain)):
        mf = str(tmp_path / f"{name}.metrics.jsonl")
        md = str(tmp_path / f"{name}.eval.model")
        main(["--train", "--data_dir", cli_dir, "--epochs", "2",
              "--lstm_hidden_width", "8", "--head_hidden", "16",
              "--images_per_batch", "2", "--eval_every", "2",
              "--metrics_file", mf, "--model_file", md])
        evals = [json.loads(l) for l in open(mf) if "eval_loss" in l]
        assert evals, f"no eval entries for {name}"
        for e in evals:
            assert np.isfinite(e["eval_loss"]) and 0 <= e["eval_acc"] <= 1

    # mention-task flavor (nonvisual FFNN)
    from icl.cli.nonvisual import main as nmain
    mf = str(tmp_path / "nv.metrics.jsonl")
    nmain(["--train", "--data_dir", cli_dir, "--epochs", "3",
           "--batch_size", "32", "--hidden_width", "16", "--eval_every", "2",
           "--metrics_file", mf,
           "--model_file", str(tmp_path / "nv.eval.model")])
    evals = [json.loads(l) for l in open(mf) if "eval_loss" in l]
    assert evals and all(np.isfinite(e["eval_loss"]) for e in evals)

    # missing eval split → hook disabled, training still runs
    md = str(tmp_path / "noeval.model")
    rmain(["--train", "--data_dir", cli_dir, "--epochs", "1",
           "--lstm_hidden_width", "8", "--head_hidden", "16",
           "--images_per_batch", "2", "--eval_every", "2",
           "--eval_split", "nonexistent", "--model_file", md])


def test_eval_grounding(capsys, tmp_path):
    """--task grounding: top-1 grounding accuracy from a --rank_file and
    gold affinity feats, hand-computable on known inputs."""
    from icl.cli.evaluate import main as emain

    def mid(m):
        return f"doc:d.jpg;caption:0;mention:{m}"

    sp = str(tmp_path / "g.rank")
    fp = str(tmp_path / "g.feats")
    # mention 0: top box=1 (0.7), gold positive at box 1 → hit
    # mention 1: top box=0 (0.6), gold positive at box 2 → miss
    # mention 2: no positive gold box → excluded
    with open(sp, "w") as f:
        rows = [(0, 0, 0.3), (0, 1, 0.7), (1, 0, 0.6), (1, 2, 0.4),
                (2, 0, 0.5), (2, 1, 0.5)]
        for m, b, p in rows:
            f.write(f"{mid(m)};box:{b},{p:.6f}\n")
    with open(fp, "w") as f:
        gold = [(0, 0, 0), (0, 1, 1), (1, 0, 0), (1, 2, 1),
                (2, 0, 0), (2, 1, 0)]
        for m, b, lab in gold:
            f.write(f"{lab} 1:1.0 # {mid(m)};box:{b}\n")
    emain(["--task", "grounding", "--scores", sp, "--feats", fp])
    out = capsys.readouterr().out
    assert "Top-1 grounding accuracy: 50.00% (1/2" in out, out


def test_eval_grounding_id_drift(capsys, monkeypatch, tmp_path):
    """Top-ranked cells absent from gold are warned about (and hard-error
    under --strict) instead of silently scoring 0 (VERDICT r2 weak#5)."""
    import types

    import pytest

    import icl.cli.evaluate as ev
    from icl.cli.evaluate import main as emain

    # LOG's stream handler binds whichever stderr existed at first use, so
    # capsys can't reliably see it under the full suite — record directly
    warnings: list[str] = []
    monkeypatch.setattr(ev, "LOG", types.SimpleNamespace(
        warning=lambda msg, *a: warnings.append(msg % a)))

    def mid(m):
        return f"doc:d.jpg;caption:0;mention:{m}"

    sp = str(tmp_path / "g.rank")
    fp = str(tmp_path / "g.feats")
    # mention 0: top box=3 is NOT in gold (drifted id) → miss + warning;
    #   its other cell (box 1) IS gold-positive so the mention is groundable
    # mention 1: top box=0, gold positive at 0 → clean hit
    # mention 9: scored but entirely absent from gold → reported
    with open(sp, "w") as f:
        for m, b, p in [(0, 1, 0.3), (0, 3, 0.7), (1, 0, 0.9),
                        (9, 0, 0.5)]:
            f.write(f"{mid(m)};box:{b},{p:.6f}\n")
    with open(fp, "w") as f:
        for m, b, lab in [(0, 0, 0), (0, 1, 1), (1, 0, 1), (1, 1, 0)]:
            f.write(f"{lab} 1:1.0 # {mid(m)};box:{b}\n")
    emain(["--task", "grounding", "--scores", sp, "--feats", fp])
    cap = capsys.readouterr()
    # 2 groundable (mentions 0, 1); the drifted top cell counts as a miss
    assert "Top-1 grounding accuracy: 50.00% (1/2" in cap.out, cap.out
    warned = " ".join(warnings)
    assert "1 scored mentions absent from gold" in warned, warned
    assert "1 top-ranked cells absent from gold" in warned, warned
    with pytest.raises(SystemExit, match="id mismatch"):
        emain(["--task", "grounding", "--scores", sp, "--feats", fp,
               "--strict"])


def test_eval_grounding_unscored_mentions_count_as_misses(capsys, monkeypatch,
                                                          tmp_path):
    """Gold-groundable mentions missing from the rank file deflate the
    denominator as misses (with a warning / --strict error) instead of
    silently inflating accuracy for truncated rank files (r3 review)."""
    import types

    import pytest

    import icl.cli.evaluate as ev
    from icl.cli.evaluate import main as emain

    warnings: list[str] = []
    monkeypatch.setattr(ev, "LOG", types.SimpleNamespace(
        warning=lambda msg, *a: warnings.append(msg % a)))

    def mid(m):
        return f"doc:d.jpg;caption:0;mention:{m}"

    sp = str(tmp_path / "g.rank")
    fp = str(tmp_path / "g.feats")
    # rank file covers only mention 0 (hit); mentions 1 and 2 are gold-
    # groundable but never scored -> 1 hit / 3 groundable
    with open(sp, "w") as f:
        f.write(f"{mid(0)};box:0,0.900000\n")
    with open(fp, "w") as f:
        for m, b, lab in [(0, 0, 1), (1, 0, 1), (2, 1, 1), (3, 0, 0)]:
            f.write(f"{lab} 1:1.0 # {mid(m)};box:{b}\n")
    emain(["--task", "grounding", "--scores", sp, "--feats", fp])
    out = capsys.readouterr().out
    assert "Top-1 grounding accuracy: 33.33% (1/3" in out, out
    assert any("2 groundable gold mentions never scored" in w
               for w in warnings), warnings
    with pytest.raises(SystemExit, match="id mismatch"):
        emain(["--task", "grounding", "--scores", sp, "--feats", fp,
               "--strict"])


def test_eval_duplicate_score_ids_counted_once(capsys, monkeypatch, tmp_path):
    """Duplicate ids in a .scores file (e.g. concatenated shard outputs)
    are counted once, with a warning / --strict error (r3 review)."""
    import types

    import pytest

    import icl.cli.evaluate as ev
    from icl.cli.evaluate import main as emain

    warnings: list[str] = []
    monkeypatch.setattr(ev, "LOG", types.SimpleNamespace(
        warning=lambda msg, *a: warnings.append(msg % a)))

    sp = str(tmp_path / "d.scores")
    fp = str(tmp_path / "d.feats")
    def nid(m):
        return f"doc:d.jpg;caption:{m};mention:0"
    with open(sp, "w") as f:
        f.write(f"{nid(0)},0.900000,0.100000\n")
        f.write(f"{nid(0)},0.900000,0.100000\n")   # duplicate line
        f.write(f"{nid(1)},0.200000,0.800000\n")
    with open(fp, "w") as f:
        f.write(f"0 1:1.0 # {nid(0)}\n1 1:1.0 # {nid(1)}\n")
    emain(["--task", "nonvisual", "--scores", sp, "--feats", fp])
    out = capsys.readouterr().out
    # 2 unique examples, both correct -> accuracy line over n=2
    assert "Accuracy: 100.00%" in out, out
    assert any("duplicate ids" in w for w in warnings), warnings
    with pytest.raises(SystemExit, match="duplicate ids"):
        emain(["--task", "nonvisual", "--scores", sp, "--feats", fp,
               "--strict"])


def test_mention_and_caption_parse_errors_carry_context(tmp_path):
    """Malformed mentions/captions lines raise with file:line context
    instead of a bare IndexError/ValueError (r3 review)."""
    import pytest

    from icl.io.captions import read_captions, read_mentions

    mp = str(tmp_path / "m.txt")
    with open(mp, "w") as f:
        f.write("doc:d.jpg;caption:0;mention:0\t0,1\n")
        f.write("doc:d.jpg;caption:0;mention:1\n")     # missing span field
    with pytest.raises(ValueError, match=r"m\.txt:2: bad mention line"):
        read_mentions(mp)
    cp = str(tmp_path / "c.txt")
    with open(cp, "w") as f:
        f.write("d.jpg#notanum\ta b c\n")
    with pytest.raises(ValueError, match=r"c\.txt:1: bad caption key"):
        read_captions(cp)
