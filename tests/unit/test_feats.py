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


def test_malformed_lines_skip_identically(tmp_path):
    """A line whose label (or, for the full parser, any idx:val token)
    fails to parse is dropped WHOLE — identically by the native and pure-
    Python paths, with a warning (r3 review finding: Python used to raise
    where native silently skipped, so behavior differed by .so presence)."""
    import logging

    from icl.io.feats import read_feats, read_feats_labels
    from icl.util.log import LOG

    # LOG has propagate=False — capture by attaching a handler directly
    records: list[logging.LogRecord] = []

    class _Rec(logging.Handler):
        def emit(self, r):
            records.append(r)

    h = _Rec(level=logging.WARNING)
    LOG._log.addHandler(h)

    p = str(tmp_path / "bad.feats")
    with open(p, "w") as f:
        f.write("1 2:0.5 # doc:a\n"
                "label 2:0.5 # doc:bad1\n"     # non-numeric label
                "1x 2:0.5 # doc:bad2\n"        # numeric-prefix label
                "0 3:abc # doc:bad3\n"         # malformed value token
                "0.5 4:1.0 # doc:b\n")
    for use_native in (False, True):
        records.clear()
        full = read_feats(p, use_native=use_native)
        assert [ex.example_id for ex in full] == ["doc:a", "doc:b"], use_native
        assert any("malformed" in r.getMessage() for r in records)
    # labels-only scan validates the LABEL field only (tokens skipped by
    # design): bad3's tokens are never parsed, so it survives on that path
    for use_native in (False, True):
        ids, labels = read_feats_labels(p, use_native=use_native)
        assert ids == ["doc:a", "doc:bad3", "doc:b"], use_native
        assert labels.tolist() == [1.0, 0.0, 0.5]
    LOG._log.removeHandler(h)


def test_numeric_grammar_parity_and_range(tmp_path):
    """Grammar quirks where Python float() and C strtod diverge — hex
    floats, underscore separators, out-of-int32 indices — are rejected
    IDENTICALLY by both parsers (r3 review: line-keeping used to depend on
    whether the .so built)."""
    import numpy as np

    from icl.io.feats import FeatsExample, read_feats

    p = str(tmp_path / "g.feats")
    with open(p, "w") as f:
        f.write("1 2:0.5 # doc:a\n"
                "1_0.5 1:2 # doc:u\n"           # Python-only underscores
                "3 1:0x1A # doc:h\n"            # C-only hex float
                "0x2 1:1.0 # doc:hl\n"          # hex label
                "2 99999999999:1.0 # doc:o\n"   # index beyond int32
                "nan(1) 1:2 # doc:np\n"         # C-only nan payload label
                "4 1:nan(2) # doc:nv\n"         # C-only nan payload value
                "0.5 4:1.0 # doc:b\n")
    for use_native in (False, True):
        full = read_feats(p, use_native=use_native)
        assert [e.example_id for e in full] == ["doc:a", "doc:b"], use_native
    # densify ignores out-of-range indices instead of wrapping to the tail
    ex = FeatsExample("x", 1.0, np.array([0, 2, 9], np.int32),
                      np.array([5.0, 7.0, 9.0], np.float32))
    assert ex.to_dense(3).tolist() == [0.0, 7.0, 0.0]
