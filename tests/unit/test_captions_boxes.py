"""Unit tests for caption/mention/box loaders (C3, C5) and id schemes."""

import os

import numpy as np
import pytest

from icl.io.boxes import (group_boxes_by_image, make_box_id, parse_box_id,
                          read_box_feats, write_box_feats)
from icl.io.captions import (make_pair_id, parse_mention_id, parse_pair_id,
                             read_captions, read_mentions)


def test_id_schemes():
    assert parse_mention_id("doc:12.jpg;caption:3;mention:4") == ("12.jpg", 3, 4)
    pid = make_pair_id("12.jpg", 0, 1, 2, 3)
    assert pid == "doc:12.jpg;caption_1:0;mention_1:1;caption_2:2;mention_2:3"
    assert parse_pair_id(pid) == ("12.jpg", 0, 1, 2, 3)
    assert parse_box_id(make_box_id("x.jpg", 7)) == ("x.jpg", 7)
    with pytest.raises(ValueError):
        parse_mention_id("doc:12.jpg;box:1")


def test_captions_mentions_roundtrip(synth_dir):
    caps = read_captions(os.path.join(synth_dir, "train.captions.txt"))
    ments = read_mentions(os.path.join(synth_dir, "train.mentions.txt"))
    assert caps and ments
    for m in ments:
        cap = caps[m.caption_key]
        assert 0 <= m.first <= m.last < len(cap.tokens)
        if m.text:
            assert m.text.split() == cap.tokens[m.first:m.last + 1]


def test_box_feats_npz(synth_dir):
    ids, feats = read_box_feats(os.path.join(synth_dir, "train.boxes.npz"))
    assert feats.dtype == np.float32 and len(ids) == feats.shape[0]
    by_img = group_boxes_by_image(ids, feats)
    for img, (order, f) in by_img.items():
        assert order == sorted(order)
        assert f.shape[0] == len(order)


def test_box_feats_npz_mmap(synth_dir, tmp_path):
    """The mmap path returns a true memory map with identical data, and the
    lazy grouping touches no feature bytes until a row is sliced
    (SURVEY §4.3 'memory-mapped'; VERDICT r1 missing#4)."""
    from icl.io.boxes import BoxRows

    path = os.path.join(synth_dir, "train.boxes.npz")
    ids_e, feats_e = read_box_feats(path)
    ids_m, feats_m = read_box_feats(path, mmap=True)
    assert ids_m == ids_e
    assert isinstance(feats_m, np.memmap), "mmap path fell back to eager"
    np.testing.assert_array_equal(np.asarray(feats_m), feats_e)

    lazy = group_boxes_by_image(ids_m, feats_m, lazy=True)
    eager = group_boxes_by_image(ids_e, feats_e)
    for img in eager:
        order_l, rows = lazy[img]
        order_e, arr = eager[img]
        assert order_l == order_e
        assert isinstance(rows, BoxRows)
        assert rows.shape == arr.shape and len(rows) == arr.shape[0]
        np.testing.assert_array_equal(rows[:2], arr[:2])      # sliced read
        np.testing.assert_array_equal(np.asarray(rows), arr)  # full read

    # compressed archives (pre-round-2 writer) still load, eagerly
    import zipfile
    comp = str(tmp_path / "c.boxes.npz")
    with open(comp, "wb") as f:
        np.savez_compressed(f, ids=np.array(ids_e), feats=feats_e)
    ids_c, feats_c = read_box_feats(comp, mmap=True)
    assert ids_c == ids_e and not isinstance(feats_c, np.memmap)
    np.testing.assert_array_equal(feats_c, feats_e)


def test_box_feats_text_roundtrip(tmp_path):
    ids = [make_box_id("a.jpg", 0), make_box_id("a.jpg", 1)]
    feats = np.array([[1.5, -2.0], [0.0, 3.25]], np.float32)
    p = str(tmp_path / "b.boxes.txt")
    write_box_feats(p, ids, feats)
    rids, rfeats = read_box_feats(p)
    assert rids == ids
    np.testing.assert_allclose(rfeats, feats)


def test_mmap_rejects_inconsistent_member(tmp_path):
    """A feats.npy whose header extent disagrees with the zip member size
    (truncated/hand-edited archive) must fall back to the eager load, not
    silently memmap into the next member's bytes (r3 review)."""
    import zipfile

    import numpy as np

    from icl.io.boxes import _mmap_npz_member

    p = str(tmp_path / "b.npz")
    feats = np.arange(12, dtype=np.float32).reshape(3, 4)
    ids = np.array(["a", "b", "c"])
    np.savez(p, feats=feats, ids=ids)            # STORED members
    good = _mmap_npz_member(p, "feats.npy")
    assert good is not None and good.shape == (3, 4)
    # corrupt the header's claimed shape in place: (3, 4) -> (9, 4)
    raw = bytearray(open(p, "rb").read())
    idx = raw.find(b"(3, 4)")
    assert idx > 0
    raw[idx:idx + 6] = b"(9, 4)"
    open(p, "wb").write(bytes(raw))
    assert _mmap_npz_member(p, "feats.npy") is None


def test_mmap_rejects_non_f32_member(tmp_path):
    """dtype must not vary with the mmap performance flag: f64 members
    fall back to the eager path's f32 cast (r3 review)."""
    import numpy as np

    from icl.io.boxes import _mmap_npz_member, read_box_feats

    p = str(tmp_path / "b64.npz")
    np.savez(p, feats=np.ones((2, 3), np.float64),
             ids=np.array(["a", "b"]))
    assert _mmap_npz_member(p, "feats.npy") is None
    ids, feats = read_box_feats(p, mmap=True)
    assert feats.dtype == np.float32
