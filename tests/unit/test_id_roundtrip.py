"""Non-canonical (zero-padded) `.feats` ids must round-trip byte-exactly
into `.scores` order (r3 review finding: the bounded-memory loaders
re-serialize ids from parsed ints, silently dropping zero-padding and
breaking the gold-vs-scores join downstream)."""

import numpy as np
import pytest

from icl.data.embeddings import EmbeddingStore
from icl.data.pipeline import (load_affinity_dataset, load_relation_dataset,
                               split_path)
from icl.testing import SynthConfig, generate_dataset


@pytest.fixture
def synth_dir(tmp_path):
    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=3, seed=5))
    return d


def _emb(d):
    return EmbeddingStore.load(f"{d}/embeddings.txt")


def _pad_first_field(line: str, field: str) -> str:
    """caption_1:3 → caption_1:003 (first occurrence)."""
    pre, sep, post = line.partition(field + ":")
    assert sep, line
    num = post.split(";", 1)[0].split(",", 1)[0].split()[0]
    return pre + sep + "00" + num + post[len(num):]


def test_relation_zero_padded_ids_roundtrip(synth_dir):
    path = split_path(synth_dir, "train", "relation.feats")
    lines = open(path).read().splitlines()
    # zero-pad one id's caption field mid-file
    target = next(i for i, l in enumerate(lines) if "#" in l and i > 2)
    head, _, eid = lines[target].partition("# ")
    padded = _pad_first_field(eid, "caption_1")
    assert padded != eid
    lines[target] = head + "# " + padded
    open(path, "w").write("\n".join(lines) + "\n")

    ds = load_relation_dataset(synth_dir, "train", _emb(synth_dir))
    all_ids = [pid for im in ds.images for pid in im.pair_ids]
    assert padded in all_ids                 # exact file bytes preserved
    assert eid not in all_ids                # not silently canonicalized
    # every other id still canonical & present
    others = [l.partition("# ")[2] for i, l in enumerate(lines)
              if "#" in l and i != target]
    assert set(others) <= set(all_ids)


def test_affinity_zero_padded_ids_roundtrip(synth_dir):
    path = split_path(synth_dir, "train", "affinity.feats")
    lines = open(path).read().splitlines()
    target = next(i for i, l in enumerate(lines) if "#" in l and i > 2)
    head, _, eid = lines[target].partition("# ")
    padded = _pad_first_field(eid, "box")
    assert padded != eid
    lines[target] = head + "# " + padded
    open(path, "w").write("\n".join(lines) + "\n")

    ds = load_affinity_dataset(synth_dir, "train", _emb(synth_dir))
    from icl.io.captions import parse_mention_id
    all_ids = []
    for im in ds.images:
        for r, mid in enumerate(im.mention_ids):
            _, ci, mi = parse_mention_id(mid)
            for c, bi in enumerate(im.box_idx):
                if im.grid_valid[r, c]:
                    all_ids.append(im.cell_id(ci, mi, bi))
    assert padded in all_ids
    assert eid not in all_ids


def test_pair_ids_cached_and_stable(synth_dir):
    ds = load_relation_dataset(synth_dir, "train", _emb(synth_dir))
    im = ds.images[0]
    first = im.pair_ids
    assert im.pair_ids is first              # cached_property: derived once


def test_manual_parsers_pin_the_grammar():
    """The hand-rolled parsers must reject exactly what the old anchored
    regexes rejected (plus unicode digits / trailing newlines, which are
    deliberately narrower — see icl/io/captions.py grammar note)."""
    import pytest

    from icl.data.pipeline import parse_affinity_id, parse_affinity_id_padded
    from icl.io.captions import (parse_mention_id, parse_mention_id_padded,
                                 parse_pair_id, parse_pair_id_padded)

    assert parse_mention_id("doc:a.jpg;caption:0;mention:12") == \
        ("a.jpg", 0, 12)
    assert parse_pair_id(
        "doc:a.jpg;caption_1:1;mention_1:0;caption_2:2;mention_2:3") == \
        ("a.jpg", 1, 0, 2, 3)
    assert parse_affinity_id("doc:a.jpg;caption:0;mention:1;box:9") == \
        ("a.jpg", 0, 1, 9)
    # padded flags
    assert parse_mention_id_padded("doc:a;caption:07;mention:1")[-1] is True
    assert parse_mention_id_padded("doc:a;caption:0;mention:1")[-1] is False
    assert parse_pair_id_padded(
        "doc:a;caption_1:0;mention_1:00;caption_2:1;mention_2:2")[-1] is True
    assert parse_affinity_id_padded(
        "doc:a;caption:0;mention:1;box:010")[-1] is True

    bad_mentions = [
        "doc:a.jpg;caption:x;mention:1",       # non-digit
        "doc:a.jpg;caption:1;mention:",        # empty field
        "doc:;caption:1;mention:2",            # empty doc
        "doc:a;b.jpg;caption:1;mention:2",     # ';' in doc
        "doc:a.jpg;caption:1;mention:2\n",     # trailing newline
        "doc:a.jpg;caption:١;mention:2",       # unicode digit
        "doc:a.jpg;caption:1;mention:2;extra", # trailing junk
        "Xdoc:a.jpg;caption:1;mention:2",      # bad prefix
        "doc:a.jpg;caption:-1;mention:2",      # sign
    ]
    for s in bad_mentions:
        with pytest.raises(ValueError):
            parse_mention_id(s)
    for s in ("doc:a;caption_1:1;mention_1:2;caption_2:3;mention_2:4x",
              "doc:a;caption_1:1;mention_1:2;caption_2:3",
              "doc:a;caption:1;mention:2"):
        with pytest.raises(ValueError):
            parse_pair_id(s)
    for s in ("doc:a;caption:1;mention:2",
              "doc:a;caption:1;mention:2;box:", 
              "doc:a;caption:1;mention:2;box:3;more:4"):
        with pytest.raises(ValueError):
            parse_affinity_id(s)


def test_manual_parsers_match_reference_regexes_fuzzed():
    """Randomized crosscheck: the hand-rolled parsers accept/reject and
    extract exactly like the documented reference regexes (ASCII-digit
    variant) on a large sample of near-miss strings."""
    import random
    import re

    from icl.data.pipeline import parse_affinity_id
    from icl.io.captions import parse_mention_id, parse_pair_id

    mention_re = re.compile(
        r"doc:(?P<doc>[^;]+);caption:(?P<c>[0-9]+);mention:(?P<m>[0-9]+)$",
        re.ASCII)
    pair_re = re.compile(
        r"doc:(?P<doc>[^;]+);caption_1:(?P<c1>[0-9]+);mention_1:(?P<m1>[0-9]+)"
        r";caption_2:(?P<c2>[0-9]+);mention_2:(?P<m2>[0-9]+)$", re.ASCII)
    aff_re = re.compile(
        r"doc:(?P<doc>[^;]+);caption:(?P<c>[0-9]+);mention:(?P<m>[0-9]+)"
        r";box:(?P<b>[0-9]+)$", re.ASCII)
    # re's $ matches before a trailing \n — the manual parsers are stricter
    def fullmatch(rx, s):
        m = rx.match(s)
        return m if (m and not s.endswith("\n")) else None

    rng = random.Random(0)
    pieces = ["doc:", "caption:", "mention:", "box:", "caption_1:",
              "mention_1:", "caption_2:", "mention_2:", ";", "#", "0", "7",
              "07", "img.jpg", "", "x", "\n", " ", ":", "12"]
    cases = []
    for _ in range(4000):
        cases.append("".join(rng.choice(pieces)
                             for _ in range(rng.randint(1, 10))))
    # seed with valid forms and close mutations
    for d in ("a.jpg", "b", "x y.jpg"):
        cases.append(f"doc:{d};caption:3;mention:0")
        cases.append(f"doc:{d};caption_1:1;mention_1:2"
                     f";caption_2:3;mention_2:4")
        cases.append(f"doc:{d};caption:1;mention:2;box:07")

    for s, rx, fn, groups in (
            [(c, mention_re, parse_mention_id, ("doc", "c", "m"))
             for c in cases]
            + [(c, pair_re, parse_pair_id, ("doc", "c1", "m1", "c2", "m2"))
               for c in cases]
            + [(c, aff_re, parse_affinity_id, ("doc", "c", "m", "b"))
               for c in cases]):
        m = fullmatch(rx, s)
        try:
            got = fn(s)
        except ValueError:
            got = None
        if m is None:
            assert got is None, (s, got)
        else:
            want = (m.group("doc"),) + tuple(
                int(m.group(g)) for g in groups[1:])
            assert got == want, (s, got, want)
