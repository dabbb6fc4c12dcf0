"""Unit tests for the `.scores` format contract (SURVEY §6.2)."""

import json
import os

import numpy as np

from icl.io.scores import read_scores, write_scores


def test_write_read_roundtrip(tmp_path):
    ids = ["doc:a.jpg;caption:0;mention:0", "doc:a.jpg;caption:1;mention:1"]
    probs = np.array([[0.25, 0.75], [0.9999995, 0.0000005]])
    p = str(tmp_path / "out.scores")
    write_scores(p, ids, probs, class_order=["visual", "nonvisual"])
    lines = open(p).read().splitlines()
    assert lines[0] == "doc:a.jpg;caption:0;mention:0,0.250000,0.750000"
    assert lines[1].endswith(",1.000000,0.000000")  # 6-dp rounding
    rids, rprobs = read_scores(p)
    assert rids == ids
    np.testing.assert_allclose(rprobs, np.round(probs, 6))
    meta = json.load(open(p + ".meta.json"))
    assert meta["class_order"] == ["visual", "nonvisual"]
    assert meta["num_examples"] == 2


def test_deterministic_bytes(tmp_path):
    """Two writes of identical data are bitwise identical (SURVEY §7.3)."""
    ids = [f"id{i}" for i in range(5)]
    probs = np.random.default_rng(0).random((5, 4))
    probs /= probs.sum(1, keepdims=True)
    p1, p2 = str(tmp_path / "a.scores"), str(tmp_path / "b.scores")
    write_scores(p1, ids, probs)
    write_scores(p2, ids, probs)
    assert open(p1, "rb").read() == open(p2, "rb").read()


def test_extreme_values_native_python_byte_parity(tmp_path):
    """%.6f of ±1e300 is ~314 chars — the native writer's fixed buffer must
    hold it (or bail to the Python fallback), never append snprintf's
    would-be length past the buffer (ADVICE r3).  Both paths byte-equal."""
    ids = ["a", "b", "c"]
    # sign-bit NaN: glibc %.6f prints "-nan" but Python prints "nan" —
    # the native writer must pin the Python bytes
    probs = np.array([[1e300, -1e300], [0.5, 1e-300],
                      [np.nan, -np.nan]])
    p_python = str(tmp_path / "p.scores")
    with open(p_python, "w", encoding="utf-8", newline="\n") as f:
        for eid, row in zip(ids, probs):
            f.write(eid + "," + ",".join(f"{v:.6f}" for v in row) + "\n")
    try:
        from icl.native.feats import write_scores_native

        p_native = str(tmp_path / "n.scores")
        if write_scores_native(p_native, ids, probs):
            assert (open(p_native, "rb").read()
                    == open(p_python, "rb").read())
    except ImportError:
        pass
    # the public writer must produce the same bytes whichever path ran
    w = str(tmp_path / "w.scores")
    write_scores(w, ids, probs)
    assert open(w, "rb").read() == open(p_python, "rb").read()


def test_read_scores_empty_field_errors(tmp_path):
    """'id,' is one EMPTY field: float('') must raise like the original
    per-field loop (ADVICE r3) — not silently become a zero-field row."""
    import pytest

    p = tmp_path / "e.scores"
    p.write_text("id,\n")
    with pytest.raises(ValueError):
        read_scores(str(p))
    # a bare id with NO separator stays a zero-field row
    p.write_text("id\n")
    rids, rprobs = read_scores(str(p))
    assert rids == ["id"] and rprobs.shape == (1, 0)
