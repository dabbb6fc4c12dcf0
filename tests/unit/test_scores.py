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
