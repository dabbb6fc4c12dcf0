"""Native id-table parse (C++ featsl_parse_ids) vs the pure-Python loaders.

The fast path parses example ids and groups rows per image entirely in
C++/numpy (icl/data/pipeline._fast_grouped_rows); its contract is
DATASET-LEVEL equality with the pure-Python path, and whole-load fallback
(return None) on any id that deviates from the §6.1 grammar so the Python
path's exact error behavior applies."""

import numpy as np
import pytest

import icl.native as native
from icl.data import pipeline
from icl.data.embeddings import EmbeddingStore
from icl.data.pipeline import (load_affinity_dataset, load_relation_dataset,
                               split_path)
from icl.testing import SynthConfig, generate_dataset

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native library unavailable")


@pytest.fixture
def synth_dir(tmp_path):
    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=11))
    return d


def _emb(d):
    return EmbeddingStore.load(f"{d}/embeddings.txt")


def _load_both(loader, d, monkeypatch):
    fast = loader(d, "train", _emb(d))
    with monkeypatch.context() as m:
        m.setattr(pipeline, "_fast_grouped_rows", lambda *a: None)
        slow = loader(d, "train", _emb(d))
    return fast, slow


def _pad_field(path, field, skip=2):
    lines = open(path).read().splitlines()
    target = next(i for i, l in enumerate(lines) if "#" in l and i > skip)
    head, _, eid = lines[target].partition("# ")
    pre, sep, post = eid.partition(field + ":")
    num = post.split(";", 1)[0]
    lines[target] = head + "# " + pre + sep + "00" + num + post[len(num):]
    open(path, "w").write("\n".join(lines) + "\n")


def test_relation_dataset_parity(synth_dir, monkeypatch):
    # include a zero-padded id so the override path is compared too
    _pad_field(split_path(synth_dir, "train", "relation.feats"), "mention_2")
    fast, slow = _load_both(load_relation_dataset, synth_dir, monkeypatch)
    assert len(fast.images) == len(slow.images) > 0
    for x, y in zip(fast.images, slow.images):
        assert x.img_id == y.img_id
        for f in ("tokens", "tok_len", "m_cap", "m_first", "m_last",
                  "pair_ij", "pair_label", "pair_key"):
            np.testing.assert_array_equal(getattr(x, f), getattr(y, f), f)
            assert getattr(x, f).dtype == getattr(y, f).dtype, f
        assert (x.pair_id_overrides or {}) == (y.pair_id_overrides or {})
        assert x.pair_ids == y.pair_ids


def test_affinity_dataset_parity(synth_dir, monkeypatch):
    _pad_field(split_path(synth_dir, "train", "affinity.feats"), "box")
    fast, slow = _load_both(load_affinity_dataset, synth_dir, monkeypatch)
    assert len(fast.images) == len(slow.images) > 0
    for x, y in zip(fast.images, slow.images):
        assert x.img_id == y.img_id
        for f in ("phrase_tokens", "phrase_len", "grid_label", "grid_valid"):
            np.testing.assert_array_equal(getattr(x, f), getattr(y, f), f)
            assert getattr(x, f).dtype == getattr(y, f).dtype, f
        assert x.mention_ids == y.mention_ids
        assert x.box_idx == y.box_idx
        assert (x.cell_id_overrides or {}) == (y.cell_id_overrides or {})
        np.testing.assert_array_equal(np.asarray(x.box_feats),
                                      np.asarray(y.box_feats))


def _one_row_feats(tmp_path, eid, label="1"):
    p = tmp_path / "t.feats"
    p.write_text(f"{label} 3:0.5 # {eid}\n")
    return str(p)


def test_native_grammar_fuzz_matches_python(tmp_path):
    """Per-id crosscheck: for every fuzz case, the native parse either
    extracts exactly what the Python parser does or signals fallback
    exactly when the Python parser raises."""
    import random

    from icl.data.pipeline import parse_affinity_id_padded
    from icl.io.captions import parse_mention_id_padded, parse_pair_id_padded
    from icl.native.feats import parse_feats_ids

    rng = random.Random(7)
    pieces = ["doc:", "caption:", "mention:", "box:", "caption_1:",
              "mention_1:", "caption_2:", "mention_2:", ";", "0", "7",
              "07", "img.jpg", "", "x", ":", "12", "4294967296"]
    cases = ["".join(rng.choice(pieces) for _ in range(rng.randint(1, 10)))
             for _ in range(800)]
    for d in ("a.jpg", "b", "x y.jpg", "ümlaut.jpg"):
        cases += [f"doc:{d};caption:3;mention:0",
                  f"doc:{d};caption:03;mention:0",
                  f"doc:{d};caption_1:1;mention_1:2;caption_2:3;mention_2:4",
                  f"doc:{d};caption_1:1;mention_1:02;caption_2:3;mention_2:4",
                  f"doc:{d};caption:1;mention:2;box:07",
                  f"doc:{d};caption:1;mention:2;box:2147483647",
                  f"doc:{d};caption:1;mention:2;box:2147483648"]

    for kind, parser, k in (("mention", parse_mention_id_padded, 2),
                            ("pair", parse_pair_id_padded, 4),
                            ("affinity", parse_affinity_id_padded, 3)):
        for eid in cases:
            if "#" in eid or "\n" in eid or eid != eid.strip():
                continue  # not representable as a feats id comment
            path = _one_row_feats(tmp_path, eid)
            try:
                want = parser(eid)
                # int32-range fields only: the loaders' array('i') would
                # raise OverflowError -> native must fall back
                in_range = all(v <= 2**31 - 1 for v in want[1:-1])
            except ValueError:
                want, in_range = None, False
            got = parse_feats_ids(path, kind)
            if want is None or not in_range:
                assert got is None, (kind, eid)
            else:
                assert got is not None, (kind, eid)
                labels, fields, doc_idx, docs, overrides = got
                assert docs[int(doc_idx[0])] == want[0], (kind, eid)
                assert fields[0].tolist() == list(want[1:-1]), (kind, eid)
                padded = want[-1]
                assert (0 in overrides) is padded, (kind, eid)
                if padded:
                    assert overrides[0] == eid


def test_mention_dataset_parity_and_padded_ids(synth_dir, monkeypatch):
    """load_mention_dataset: native fast path ≡ Python fallback, and a
    zero-padded feats id joins by parsed ints while `ids` keeps the
    file's exact bytes (pre-r3, the canonical-string dict join crashed)."""
    from icl.data.pipeline import load_mention_dataset
    from icl.native import feats as nat_feats

    path = split_path(synth_dir, "train", "nonvisual.feats")
    _pad_field(path, "mention")
    from icl.io.captions import parse_mention_id_padded
    lines = open(path).read().splitlines()
    padded_id = next(eid for eid in (l.partition("# ")[2]
                                     for l in lines if "#" in l)
                     if parse_mention_id_padded(eid)[-1])
    emb = _emb(synth_dir)
    fast = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    with monkeypatch.context() as m:
        m.setattr(nat_feats, "parse_feats_ids", lambda *a: None)
        slow = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    np.testing.assert_array_equal(fast.token_ids, slow.token_ids)
    np.testing.assert_array_equal(fast.lengths, slow.lengths)
    np.testing.assert_array_equal(fast.labels, slow.labels)
    assert fast.ids == slow.ids
    assert padded_id in fast.ids          # exact bytes, resolved by ints
    assert any(le > 0 for le in fast.lengths)


def test_mention_dataset_missing_mention_keyerror(synth_dir):
    from icl.data.pipeline import load_mention_dataset

    path = split_path(synth_dir, "train", "nonvisual.feats")
    with open(path, "a") as f:
        f.write("1 2:1 # doc:nosuch.jpg;caption:0;mention:0\n")
    with pytest.raises(KeyError, match="nosuch"):
        load_mention_dataset(synth_dir, "train", "nonvisual", _emb(synth_dir))


def test_caption_ids_parity(tmp_path):
    """Native caption tokenizer ≡ Python read_captions + encode_tokens:
    exact/lowercase/OOV lookups, non-ASCII rows (re-encoded in Python via
    the flagged-row path), comment/blank lines, duplicate keys last-wins,
    and zero-padded caption indices canonicalizing identically."""
    from icl.data.embeddings import EmbeddingStore
    from icl.data.pipeline import _load_caption_ids
    from icl.native import feats as _unused  # ensure lib built
    import icl.native as native_mod

    emb = EmbeddingStore.from_arrays(
        ["the", "Dog", "straße", "dog"],
        np.arange(12, dtype=np.float32).reshape(4, 3))
    p = tmp_path / "c.txt"
    p.write_text("a.jpg#0\tThe dog DOG Dog unknownword\n"
                 "# comment\n\n"
                 "a.jpg#1\tüber STRASSE straße\n"      # non-ASCII row
                 "b.jpg#02\tthe the\n"                 # padded cap idx
                 "b.jpg#2\tdog\n")                     # duplicate key wins
    fast = _load_caption_ids(str(p), emb)
    import unittest.mock as mock
    with mock.patch.object(native_mod, "_lib", None), \
         mock.patch.object(native_mod, "_load_failed", True):
        slow = _load_caption_ids(str(p), emb)
    for img, ci in (("a.jpg", 0), ("a.jpg", 1), ("b.jpg", 2)):
        np.testing.assert_array_equal(fast.ids(img, ci), slow.ids(img, ci),
                                      (img, ci))
    # semantics spot checks: exact > lowercase > PAD
    assert fast.ids("a.jpg", 0).tolist() == [1, 4, 4, 2, 0]
    assert fast.ids("b.jpg", 2).tolist() == [4]        # last duplicate wins
    assert fast.ids("a.jpg", 1).tolist() == slow.ids("a.jpg", 1).tolist()
    with pytest.raises(KeyError, match="a.jpg#9"):
        fast.ids("a.jpg", 9)
    # bad key -> native whole-file fallback -> read_captions' error
    p.write_text("nokey\tthe\n")
    from icl.native.captions import parse_captions
    assert parse_captions(str(p), emb.words_by_row()) is None
    with pytest.raises(ValueError, match="bad caption key"):
        _load_caption_ids(str(p), emb)


def test_caption_words_parity(tmp_path):
    """Native split_vocab scan ≡ read_captions dict walk — including
    duplicate keys (last-wins: words of overwritten lines must NOT enter
    the prune vocabulary) and non-ASCII rows."""
    from icl.native.captions import caption_words

    p = tmp_path / "c.txt"
    p.write_text("a.jpg#0\talpha beta\n"
                 "# comment\n"
                 "b.jpg#1\tgamma Straße\n"
                 "a.jpg#00\tdelta epsilon\n")   # overwrites a.jpg#0
    fast = caption_words(str(p))
    from icl.io.captions import read_captions
    slow = set()
    for cap in read_captions(str(p)).values():
        slow.update(cap.tokens)
    assert fast == slow
    assert "alpha" not in fast and "delta" in fast and "Straße" in fast
    p.write_text("nokey\tthe\n")
    assert caption_words(str(p)) is None        # grammar fallback


def test_grouping_with_out_of_order_docs(tmp_path):
    """File order ≠ sorted-doc order ≠ first-appearance order: the fast
    grouping must still emit sorted-doc groups with file-order rows and
    correctly-attached overrides (regression: indexing groups by
    positional sorted_rank instead of row_rank attributed every group to
    the wrong image on any non-pre-sorted split)."""
    p = tmp_path / "o.feats"
    p.write_text(
        "1 1:1 # doc:bb;caption_1:0;mention_1:0;caption_2:0;mention_2:1\n"
        "2 1:1 # doc:aa;caption_1:1;mention_1:0;caption_2:1;mention_2:1\n"
        "0 1:1 # doc:cc;caption_1:0;mention_1:0;caption_2:0;mention_2:1\n"
        "3 1:1 # doc:bb;caption_1:2;mention_1:03;caption_2:2;mention_2:1\n"
        "1 1:1 # doc:aa;caption_1:3;mention_1:0;caption_2:3;mention_2:1\n")
    fast = pipeline._fast_grouped_rows(str(p), "pair")
    slow = pipeline._python_grouped_pair_rows(str(p))
    assert [g[0] for g in fast] == [g[0] for g in slow] == ["aa", "bb", "cc"]
    for (fi, fpk, fl, fo), (si, spk, sl_, so) in zip(fast, slow):
        np.testing.assert_array_equal(fpk, spk)
        np.testing.assert_array_equal(fl, sl_)
        assert (fo or {}) == (so or {})
    # the padded bb row carries its exact-bytes override at file position 1
    assert fast[1][3] == {1: "doc:bb;caption_1:2;mention_1:03"
                             ";caption_2:2;mention_2:1"}


def test_mention_columns_parity(synth_dir):
    """Native mentions.txt columnar parse ≡ columns built from the Python
    object reader, including padded id fields and comment/blank lines."""
    from icl.io.captions import read_mention_columns

    path = f"{synth_dir}/train.mentions.txt"
    with open(path, "a") as f:
        f.write("# a comment line\n\n"
                "doc:zz.jpg;caption:02;mention:1\t3,07\textra text\n")
    fast = read_mention_columns(path)
    slow = read_mention_columns(path, use_native=False)
    assert fast.docs == slow.docs
    for f_ in ("doc_idx", "cap_idx", "mention_idx", "first", "last"):
        np.testing.assert_array_equal(getattr(fast, f_), getattr(slow, f_), f_)
        assert getattr(fast, f_).dtype == np.int32
    assert fast.docs[-1] == "zz.jpg" and fast.cap_idx[-1] == 2
    assert fast.first[-1] == 3 and fast.last[-1] == 7


def test_mention_columns_fallback_cases(tmp_path):
    """Lines the strict native grammar cannot prove equivalent must fall
    back whole-file: the loader then raises read_mentions' exact error."""
    from icl.io.captions import read_mention_columns
    from icl.native.mentions import parse_mentions

    ok = "doc:a.jpg;caption:0;mention:1\t2,3\n"
    for bad, python_accepts in (
            ("doc:a.jpg;caption:0;mention:1\t3,2\n", False),   # first > last
            ("doc:a.jpg;caption:0;mention:1\t2\n", False),     # no comma
            ("doc:a.jpg;caption:0;mention:1\n", False),        # no span
            ("doc:bad id\t2,3\n", False),                      # bad grammar
            ("doc:a.jpg;caption:0;mention:1\t+2,3\n", True),   # int('+2')=2
            ("doc:a.jpg;caption:0;mention:1\t 2,3\n", True)):  # int(' 2')=2
        p = tmp_path / "m.txt"
        p.write_text(ok + bad)
        assert parse_mentions(str(p)) is None, bad  # native punts
        if python_accepts:
            cols = read_mention_columns(str(p))     # via Python reader
            assert len(cols.cap_idx) == 2
        else:
            with pytest.raises(ValueError):
                read_mention_columns(str(p))
    # universal newlines: CRLF and bare-CR line breaks parse natively,
    # identically to Python text mode (which splits lines on \r too)
    p = tmp_path / "m.txt"
    p.write_bytes(b"doc:a.jpg;caption:0;mention:1\t2,3\r\n"
                  b"doc:b.jpg;caption:1;mention:0\t0,1\r"
                  b"doc:c.jpg;caption:2;mention:2\t1,4\n")
    got = parse_mentions(str(p))
    assert got is not None
    fast = read_mention_columns(str(p))
    slow = read_mention_columns(str(p), use_native=False)
    assert fast.docs == slow.docs == ["a.jpg", "b.jpg", "c.jpg"]
    np.testing.assert_array_equal(fast.first, slow.first)
    np.testing.assert_array_equal(fast.last, slow.last)


def test_duplicate_mention_key_keeps_last(tmp_path):
    """Duplicate (cap, mention) rows: the dict lookups were last-wins —
    the searchsorted replacements must match (side='right' - 1)."""
    from icl.data.pipeline import _mention_groups, _rows_for_mentions
    from icl.io.captions import read_mention_columns

    p = tmp_path / "m.txt"
    p.write_text("doc:a.jpg;caption:0;mention:0\t0,1\n"
                 "doc:a.jpg;caption:0;mention:1\t1,1\n"
                 "doc:a.jpg;caption:0;mention:1\t2,3\n")  # duplicate key
    cols = read_mention_columns(str(p))
    groups = _mention_groups(cols)
    sl = groups["a.jpg"]
    mkeys = (cols.cap_idx[sl].astype(np.int64) << 32) | cols.mention_idx[sl]
    pair_key = np.array([[0, 0, 0, 1]], np.int32)
    ij = _rows_for_mentions(mkeys, pair_key)
    # row index 2 is the LAST duplicate (file order preserved by lexsort)
    assert int(cols.first[sl[ij[0, 1]]]) == 2
    with pytest.raises(KeyError):
        _rows_for_mentions(mkeys, np.array([[0, 0, 0, 9]], np.int32))


def test_mentions_and_captions_fuzz_one_sided(tmp_path):
    """Randomized grammar crosscheck for the native mentions/captions
    parsers.  Invariant (one-sided, because native may punt
    conservatively): whenever the native parse RETURNS, its result must
    equal the Python reader's; whenever the Python reader raises, native
    must have punted (None) so the fallback reproduces the error."""
    import random

    from icl.io.captions import read_captions, read_mentions
    from icl.native.captions import caption_words
    from icl.native.mentions import parse_mentions

    rng = random.Random(13)
    pieces = ["doc:", "caption:", "mention:", ";", "#", "\t", ",", " ",
              "0", "7", "07", "a.jpg", "", "x y", "x", ":", "12", "-1",
              "+3", "1_0", "\r", "word", "Wo", "2,3"]
    lines = ["".join(rng.choice(pieces) for _ in range(rng.randint(1, 8)))
             for _ in range(1200)]
    lines += ["doc:a.jpg;caption:0;mention:1\t2,3",
              "doc:a.jpg;caption:0;mention:1\t2,3\tsome text",
              "a.jpg#0\tThe dog", "a.jpg#0\t", "a.jpg#0", "b#1\tx y z"]

    for ln in lines:
        p = tmp_path / "f.txt"
        p.write_text(ln + "\n")
        # mentions
        try:
            want = read_mentions(str(p))
        except ValueError:
            want = None
        got = parse_mentions(str(p))
        if want is None:
            assert got is None, ("mentions", ln)
        elif got is not None:
            docs, doc_idx, cap, men, first, last = got
            assert len(cap) == len(want), ("mentions", ln)
            for i, m in enumerate(want):
                assert (docs[doc_idx[i]], cap[i], men[i], first[i],
                        last[i]) == (m.img_id, m.cap_idx, m.mention_idx,
                                     m.first, m.last), ("mentions", ln)
        # caption words
        try:
            pw = set()
            for c in read_captions(str(p)).values():
                pw.update(c.tokens)
        except ValueError:
            pw = None
        gw = caption_words(str(p))
        if pw is None:
            assert gw is None, ("captions", ln)
        elif gw is not None:
            assert gw == pw, ("captions", ln)


def test_feats_labels_raw_fuzz(tmp_path):
    """Random raw lines through both feats label scanners: the native path
    has NO fallback mechanism, so (ids, labels) must match the Python
    parser exactly on arbitrary garbage — line keeping, skipping, comment
    handling, and newline semantics included."""
    import random

    from icl.io.feats import read_feats_labels

    rng = random.Random(29)
    pieces = ["1", "0.5", "-2", "nan", "1e3", "0x1A", "1_0", "#", " ",
              "\t", ":", "2:3", "abc", "doc:a;m:1", "\r", "", "99999999999",
              "3:", ":4", "+", "1.5e", "# id with spaces ", "\v", "\f",
              " ", "٣", "Inf", "nan(1)", "nan(", "1:nan(2)"]
    for trial in range(400):
        content = ""
        for _ in range(rng.randint(1, 6)):
            content += "".join(rng.choice(pieces)
                               for _ in range(rng.randint(0, 6)))
            content += rng.choice(["\n", "\r\n", "\r", "\n"])
        p = tmp_path / "f.feats"
        p.write_text(content, newline="")   # keep exact bytes
        ids_n, lab_n = read_feats_labels(str(p), use_native=True)
        ids_p, lab_p = read_feats_labels(str(p), use_native=False)
        assert ids_n == ids_p, (trial, content)
        np.testing.assert_array_equal(lab_n, lab_p, str((trial, content)))
        # the FULL parser (sparse idx:val columns) must match too
        from icl.io.feats import read_feats
        full_n = read_feats(str(p), use_native=True)
        full_p = read_feats(str(p), use_native=False)
        assert len(full_n) == len(full_p), (trial, content)
        for a, b in zip(full_n, full_p):
            assert a.example_id == b.example_id, (trial, content)
            assert a.label == b.label or (a.label != a.label
                                          and b.label != b.label), \
                (trial, content)
            np.testing.assert_array_equal(a.indices, b.indices,
                                          str((trial, content)))
            np.testing.assert_array_equal(a.values, b.values,
                                          str((trial, content)))


def test_feats_universal_newlines(tmp_path):
    """A bare CR is a line break in Python text mode: the C++ feats
    parsers must split identically (pre-fix, '1 2:3 # a\\r0 4:5 # b'
    parsed as ONE example with a corrupted id)."""
    from icl.io.feats import read_feats, read_feats_labels

    p = tmp_path / "t.feats"
    p.write_bytes(b"1 2:3 # doc:a;caption:0;mention:1\r"
                  b"0 4:5 # doc:b;caption:1;mention:0\r\n"
                  b"2 1:1 # doc:c;caption:2;mention:2\n")
    ids, labels = read_feats_labels(str(p))                  # native
    ids_py, labels_py = read_feats_labels(str(p), use_native=False)
    assert ids == ids_py == ["doc:a;caption:0;mention:1",
                             "doc:b;caption:1;mention:0",
                             "doc:c;caption:2;mention:2"]
    np.testing.assert_array_equal(labels, labels_py)
    full = read_feats(str(p))
    assert [e.example_id for e in full] == ids
    assert [e.label for e in full] == [1.0, 0.0, 2.0]


def test_w2v_native_rejection_falls_back_to_python(tmp_path):
    """A null native w2v handle means missing file OR rejected header —
    only the former is FileNotFoundError; for an existing-but-rejected
    file the Python loader's semantics are the contract (keep-what-parsed
    for truncated bodies, a meaningful error for garbage headers)."""
    from icl.data.embeddings import EmbeddingStore

    p = tmp_path / "huge_dim.bin"
    p.write_bytes(b"2 2000000000\nthe \x01\x02")     # native dim cap rejects
    s = EmbeddingStore.load(str(p))
    assert len(s.vocab) == 0                         # keep-what-parsed
    with pytest.raises(FileNotFoundError):
        EmbeddingStore.load(str(tmp_path / "absent.bin"))


def test_grouping_soak_random_files(tmp_path):
    """Randomized multi-row grouping soak: fast grouping ≡ Python over
    files with shuffled doc orders, interleaved images, zero-padded
    fields, duplicate rows, and float/negative labels (the grouping layer
    held the subtlest bug of the native fast path — a positional-vs-row
    index mix-up invisible on pre-sorted fixtures)."""
    import random

    rng = random.Random(171)
    docs_pool = ["b.jpg", "a.jpg", "c c.jpg", "z", "m_9.jpg"]
    for trial in range(60):
        lines = []
        for _ in range(rng.randint(1, 40)):
            d = rng.choice(docs_pool)
            ci, mi, cj, mj = (rng.randint(0, 9) for _ in range(4))
            pad = rng.random() < 0.15
            ci_s = f"0{ci}" if pad else str(ci)
            lbl = rng.choice(["0", "1", "2", "3", "-1", "2.7", "0.0"])
            lines.append(f"{lbl} 1:1 # doc:{d};caption_1:{ci_s};"
                         f"mention_1:{mi};caption_2:{cj};mention_2:{mj}")
        p = tmp_path / "g.feats"
        p.write_text("\n".join(lines) + "\n")
        fast = pipeline._fast_grouped_rows(str(p), "pair")
        slow = pipeline._python_grouped_pair_rows(str(p))
        assert fast is not None
        assert len(fast) == len(slow), trial
        for (fi, fpk, fl, fo), (si, spk, sl_, so) in zip(fast, slow):
            assert fi == si, trial
            np.testing.assert_array_equal(fpk, spk, str(trial))
            np.testing.assert_array_equal(fl, sl_, str(trial))
            assert (fo or {}) == (so or {}), trial


def test_bad_id_falls_back_to_python_error(synth_dir):
    path = split_path(synth_dir, "train", "relation.feats")
    with open(path, "a") as f:
        f.write("1 2:1 # doc:z.jpg;caption:0;mention:1\n")  # mention grammar
    with pytest.raises(ValueError, match="bad pair id"):
        load_relation_dataset(synth_dir, "train", _emb(synth_dir))


def test_overflow_id_falls_back_to_python_error(synth_dir):
    path = split_path(synth_dir, "train", "relation.feats")
    with open(path, "a") as f:
        f.write("1 2:1 # doc:z.jpg;caption_1:2147483648;mention_1:0"
                ";caption_2:0;mention_2:1\n")
    with pytest.raises(OverflowError):
        load_relation_dataset(synth_dir, "train", _emb(synth_dir))


def test_nonfinite_label_falls_back_to_python_error(synth_dir):
    path = split_path(synth_dir, "train", "relation.feats")
    with open(path, "a") as f:
        f.write("nan 2:1 # doc:z.jpg;caption_1:0;mention_1:0"
                ";caption_2:0;mention_2:1\n")
    with pytest.raises(ValueError):
        load_relation_dataset(synth_dir, "train", _emb(synth_dir))


def test_int32_overflow_label_falls_back_to_python_error(synth_dir):
    """astype(int32) would silently wrap a huge label; the Python path's
    array('i') raises OverflowError — the fast path must defer to it."""
    path = split_path(synth_dir, "train", "relation.feats")
    with open(path, "a") as f:
        f.write("4294967296 2:1 # doc:z.jpg;caption_1:0;mention_1:0"
                ";caption_2:0;mention_2:1\n")
    with pytest.raises(OverflowError):
        load_relation_dataset(synth_dir, "train", _emb(synth_dir))


def test_caption_words_key_region_high_bytes(tmp_path):
    """Invalid UTF-8 in the KEY region never reaches Python from the words
    scan (only tokens are returned), so the native path must fall back
    whole-file — split_vocab then hits read_captions' UnicodeDecodeError
    instead of silently succeeding (ADVICE r3)."""
    import pytest

    from icl.io.captions import read_captions
    from icl.native.captions import caption_words

    p = tmp_path / "c.txt"
    p.write_bytes(b"a\xffb.jpg#0\talpha beta\n")
    assert caption_words(str(p)) is None
    with pytest.raises(UnicodeDecodeError):
        read_captions(str(p))
