"""icl-export: checkpoint → flat .npz round-trip fidelity."""

import json
import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    from icl.cli import relation
    from icl.testing.synth import SynthConfig, generate_dataset

    d = tmp_path_factory.mktemp("export")
    generate_dataset(str(d), "train", SynthConfig(num_images=6, seed=9))
    model_dir = str(d / "m.model")
    relation.main(["--train", "--data_dir", str(d), "--epochs", "1",
                   "--images_per_batch", "2", "--lstm_hidden_width", "8",
                   "--head_hidden", "16", "--dropout", "0.0", "--seed", "3",
                   "--model_file", model_dir])
    return d, model_dir


def test_export_roundtrips_every_leaf(trained, tmp_path):
    import orbax.checkpoint as ocp

    from icl.cli.export import export_checkpoint, flatten_params, main

    d, model_dir = trained
    out = str(tmp_path / "w.npz")
    main(["--model_file", model_dir, "--out", out])

    with ocp.CheckpointManager(os.path.abspath(model_dir)) as mgr:
        step = mgr.latest_step()
        restored = mgr.restore(step, args=ocp.args.StandardRestore())
    want = flatten_params(restored["params"])
    with np.load(out) as z:
        assert sorted(z.files) == sorted(want)
        for k in want:
            got = z[k]
            assert got.dtype == np.asarray(want[k]).dtype, k
            np.testing.assert_array_equal(got, want[k])   # byte-identical

    man = json.load(open(out + ".manifest.json"))
    assert man["step"] == step
    assert man["model_config"]["task"] == "relation"
    assert man["total_parameters"] == sum(
        int(np.prod(v["shape"])) for v in man["params"].values())
    # the pinned layout contract: head-dense path present under its name
    assert any("head_dense" in k for k in man["params"]), man["params"].keys()

    # --step validation: an absent step is a clean error, not a crash
    with pytest.raises(ValueError, match="not in checkpoints"):
        export_checkpoint(model_dir, str(tmp_path / "x.npz"), step=step + 99)


def test_import_roundtrip_predicts_byte_identically(trained, tmp_path):
    """train → export → import → predict ≡ predicting from the original
    checkpoint dir, byte-for-byte (.scores AND the restored step), and the
    imported dir carries the model_config so no dimension flags are
    needed beyond what predict always takes."""
    from icl.cli import relation
    from icl.cli.export import main as export_main
    from icl.cli.import_ import main as import_main

    d, model_dir = trained
    out = str(tmp_path / "w.npz")
    export_main(["--model_file", model_dir, "--out", out])
    imported = str(tmp_path / "imported.model")
    import_main(["--npz", out, "--model_file", imported])

    mc = json.load(open(os.path.join(imported, "model_config.json")))
    assert mc["task"] == "relation"

    common = ["--data_dir", str(d), "--data_split", "train",
              "--images_per_batch", "2", "--lstm_hidden_width", "8",
              "--head_hidden", "16"]
    s_orig = str(tmp_path / "orig.scores")
    s_imp = str(tmp_path / "imported.scores")
    relation.main(["--predict", *common, "--model_file", model_dir,
                   "--scores_file", s_orig])
    relation.main(["--predict", *common, "--model_file", imported,
                   "--scores_file", s_imp])
    with open(s_orig, "rb") as a, open(s_imp, "rb") as b:
        assert a.read() == b.read()


def test_import_rejects_manifest_mismatch_and_occupied_dir(trained,
                                                           tmp_path):
    from icl.cli.export import main as export_main
    from icl.cli.import_ import import_checkpoint

    _, model_dir = trained
    out = str(tmp_path / "w.npz")
    export_main(["--model_file", model_dir, "--out", out])

    # tamper: drop one manifest entry — the importer must refuse rather
    # than write a checkpoint that silently diverges from its description
    man_path = out + ".manifest.json"
    man = json.load(open(man_path))
    k = sorted(man["params"])[0]
    del man["params"][k]
    with open(man_path, "w") as f:
        json.dump(man, f)
    with pytest.raises(ValueError, match="does not match its manifest"):
        import_checkpoint(out, str(tmp_path / "x.model"))

    # an already-populated model dir is never clobbered (fresh untampered
    # export so the manifest gate above doesn't mask this one)
    out2 = str(tmp_path / "w2.npz")
    export_main(["--model_file", model_dir, "--out", out2])
    with pytest.raises(ValueError, match="already holds checkpoint steps"):
        import_checkpoint(out2, model_dir)

    # --validate_only: lints without writing (and still rejects tampering)
    from icl.cli.import_ import main as import_main
    import_main(["--npz", out2, "--validate_only"])
    assert not os.path.exists(str(tmp_path / "never.model"))
    with pytest.raises(ValueError, match="does not match its manifest"):
        import_checkpoint(out, None, validate_only=True)


def test_finetune_resumes_from_imported_dir(trained, tmp_path):
    """The reference's load-weights-and-continue pattern: an imported
    directory is a valid --resume auto starting point for training (Adam
    moments restart from zeros — the import's documented contract), and
    training advances the step past the imported one."""
    from icl.cli import relation
    from icl.cli.export import main as export_main
    from icl.cli.import_ import main as import_main
    from icl.train.checkpoint import Checkpointer

    d, model_dir = trained
    out = str(tmp_path / "w.npz")
    export_main(["--model_file", model_dir, "--out", out])
    imported = str(tmp_path / "ft.model")
    import_main(["--npz", out, "--model_file", imported])
    step0 = Checkpointer(imported).latest_step
    assert step0 is not None and step0 > 0

    relation.main(["--train", "--data_dir", str(d), "--epochs", "1",
                   "--images_per_batch", "2", "--lstm_hidden_width", "8",
                   "--head_hidden", "16", "--dropout", "0.0", "--seed", "4",
                   "--resume", "auto", "--model_file", imported])
    assert Checkpointer(imported).latest_step > step0


def test_import_roundtrip_nonvisual_family(trained, tmp_path):
    """The export/import machinery is param-tree-generic: round-trip a
    NONVISUAL (FFNN) checkpoint — a different tree shape than relation —
    and predict byte-identically from the imported dir."""
    from icl.cli import nonvisual
    from icl.cli.export import main as export_main
    from icl.cli.import_ import main as import_main

    d, _ = trained
    md = str(tmp_path / "nv.model")
    nonvisual.main(["--train", "--data_dir", str(d), "--epochs", "2",
                    "--batch_size", "32", "--hidden_width", "16",
                    "--model_file", md])
    out = str(tmp_path / "nv.npz")
    export_main(["--model_file", md, "--out", out])
    imported = str(tmp_path / "nv_imported.model")
    import_main(["--npz", out, "--model_file", imported])

    common = ["--data_dir", str(d), "--data_split", "train",
              "--hidden_width", "16"]
    s1, s2 = str(tmp_path / "nv1.scores"), str(tmp_path / "nv2.scores")
    nonvisual.main(["--predict", *common, "--model_file", md,
                    "--scores_file", s1])
    nonvisual.main(["--predict", *common, "--model_file", imported,
                    "--scores_file", s2])
    with open(s1, "rb") as a, open(s2, "rb") as b:
        assert a.read() == b.read()


def test_export_empty_dir_is_clean_error(tmp_path):
    from icl.cli.export import export_checkpoint

    empty = tmp_path / "nothing.model"
    empty.mkdir()
    with pytest.raises(FileNotFoundError, match="no checkpoint steps"):
        export_checkpoint(str(empty), str(tmp_path / "w.npz"))
