"""Unit tests for the `.feats` format contract (SURVEY §6.1)."""

import numpy as np
import pytest

from icl.io.feats import (FeatsExample, parse_sparse_line, read_feats,
                          to_dense_matrix, write_feats)


def test_parse_basic():
    ex = parse_sparse_line("1 3:0.5 1:2 # doc:img.jpg;caption:0;mention:1\n")
    assert ex.example_id == "doc:img.jpg;caption:0;mention:1"
    assert ex.label == 1.0
    assert ex.indices.tolist() == [3, 1]  # unordered preserved
    assert ex.values.tolist() == [0.5, 2.0]


def test_parse_tolerance():
    assert parse_sparse_line("") is None
    assert parse_sparse_line("   \n") is None
    assert parse_sparse_line("# a comment line") is None
    ex = parse_sparse_line("0.5 2:1.25 # id1")  # float label
    assert ex.label == 0.5


def test_to_dense():
    ex = parse_sparse_line("1 3:0.5 1:2 # x")
    d = ex.to_dense(4)
    assert d.tolist() == [2.0, 0.0, 0.5, 0.0]  # 1-indexed → position i-1


def test_roundtrip(tmp_path):
    rows = [
        FeatsExample("doc:a.jpg;caption:0;mention:0", 1.0,
                     np.array([5, 2], np.int32), np.array([1.0, 0.25], np.float32)),
        FeatsExample("doc:a.jpg;caption:1;mention:2", 0.0,
                     np.array([1], np.int32), np.array([3.5], np.float32)),
    ]
    p = str(tmp_path / "t.feats")
    write_feats(p, rows)
    back = read_feats(p)
    assert len(back) == 2
    for a, b in zip(rows, back):
        assert a.example_id == b.example_id
        assert a.label == b.label
        assert a.indices.tolist() == b.indices.tolist()
        np.testing.assert_allclose(a.values, b.values)
    # exact byte format
    text = open(p).read()
    assert text.splitlines()[0] == "1 5:1 2:0.25 # doc:a.jpg;caption:0;mention:0"


def test_dense_matrix():
    rows = [parse_sparse_line("1 2:1 # a"), parse_sparse_line("0 3:2 # b")]
    X, y, ids = to_dense_matrix(rows)
    assert X.shape == (2, 3)
    assert y.tolist() == [1.0, 0.0]
    assert ids == ["a", "b"]


def test_python_native_equality(tmp_path, synth_dir):
    """Native C++ parser (if built) must agree with the Python parser."""
    import os
    p = os.path.join(synth_dir, "train.relation.feats")
    py = read_feats(p, use_native=False)
    nat = read_feats(p, use_native=True)
    assert len(py) == len(nat)
    for a, b in zip(py, nat):
        assert a.example_id == b.example_id and a.label == b.label
        assert a.indices.tolist() == b.indices.tolist()
        np.testing.assert_allclose(a.values, b.values, rtol=1e-6)


def test_labels_only_python_native_equality(tmp_path, synth_dir):
    """read_feats_labels (native + Python) ≡ full-parse (id, label) columns,
    including no-id lines and stray comments."""
    import os

    from icl.io.feats import read_feats_labels

    p = os.path.join(synth_dir, "train.relation.feats")
    full = read_feats(p, use_native=False)
    for use_native in (False, True):
        ids, labels = read_feats_labels(p, use_native=use_native)
        assert ids == [ex.example_id for ex in full]
        np.testing.assert_allclose(labels,
                                   [ex.label for ex in full], rtol=1e-12)
    # edge cases the synth file lacks: id-less line, comment, trailing blank
    p2 = str(tmp_path / "edge.feats")
    with open(p2, "w") as f:
        f.write("1 2:0.5\n# comment only\n\n0.25 1:1 # doc:x \n")
    for use_native in (False, True):
        ids, labels = read_feats_labels(p2, use_native=use_native)
        assert ids == ["", "doc:x"]
        assert labels.tolist() == [1.0, 0.25]
