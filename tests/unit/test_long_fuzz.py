"""Opt-in long soak fuzz for the native parsers (ICL_LONG_FUZZ=1).

The committed fuzz tests run a few hundred trials; these soaks run
thousands with a wider adversarial alphabet.  They found three real bugs
during round 3 (universal-newline splitting, \\v/\\f whitespace and id
trimming, a strtof line-crossing value parse) — rerun them after ANY
native parser change::

    ICL_LONG_FUZZ=1 python3 -m pytest tests/unit/test_long_fuzz.py -q
"""

import os
import random

import numpy as np
import pytest

pytestmark = pytest.mark.skipif(os.environ.get("ICL_LONG_FUZZ") != "1",
                                reason="set ICL_LONG_FUZZ=1 to run soaks")

_FEATS_PIECES = [
    "1", "0.5", "-2", "nan", "NaN", "1e3", "1E-2", "0x1A", "1_0", "#", " ",
    "\t", ":", "2:3", "abc", "doc:a;m:1", "\r", "", "99999999999", "3:",
    ":4", "+", "-", ".", "1.5e", "# id ", "\v", "\f", "\xa0", "٣", "Inf",
    "infinity", "1.", ".5", "2147483648", "+inf", "e5", "0:0", "-1:-1",
    "1:+2", "1:.5", "1::2", "##", "1#2#3", "1:2e", "1:0x3",
    "nan(1)", "nan(", "1:nan(2)", "-NAN(x)"]

_ID_PIECES = [
    "doc:", "caption:", "mention:", ";", "#", "\t", ",", " ", "0", "7",
    "07", "a.jpg", "", "x y", "x", ":", "12", "-1", "+3", "1_0", "\r",
    "word", "Wo", "2,3", "\v", "\f", "2147483648", "a#b", "#0", "٣",
    "a#1\tw", "0,0", ",,", "\t\t"]


def _random_file(rng, pieces, path):
    content = ""
    for _ in range(rng.randint(1, 6)):
        content += "".join(rng.choice(pieces)
                           for _ in range(rng.randint(0, 7)))
        content += rng.choice(["\n", "\r\n", "\r", "\n", ""])
    with open(path, "w", newline="") as f:
        f.write(content)
    return content


def _eq(x, y):
    return len(x) == len(y) and np.array_equal(
        np.asarray(x, float), np.asarray(y, float), equal_nan=True)


@pytest.mark.parametrize("seed", [97, 2027, 555])
def test_feats_soak(tmp_path, seed):
    from icl.io.feats import read_feats, read_feats_labels

    rng = random.Random(seed)
    p = str(tmp_path / "f.feats")
    for trial in range(3000):
        content = _random_file(rng, _FEATS_PIECES, p)
        a = read_feats_labels(p, use_native=True)
        b = read_feats_labels(p, use_native=False)
        assert a[0] == b[0] and _eq(a[1], b[1]), (trial, content)
        fa = read_feats(p, use_native=True)
        fb = read_feats(p, use_native=False)
        assert len(fa) == len(fb), (trial, content)
        for x, y in zip(fa, fb):
            assert x.example_id == y.example_id, (trial, content)
            assert _eq([x.label], [y.label]), (trial, content)
            assert np.array_equal(x.indices, y.indices), (trial, content)
            assert _eq(x.values, y.values), (trial, content)


@pytest.mark.parametrize("seed", [131, 4099])
def test_mentions_captions_soak(tmp_path, seed):
    from icl.io.captions import read_captions, read_mentions
    from icl.native.captions import caption_words
    from icl.native.mentions import parse_mentions

    rng = random.Random(seed)
    p = str(tmp_path / "f")
    for trial in range(2000):
        content = _random_file(rng, _ID_PIECES, p)
        try:
            want = read_mentions(p)
        except ValueError:
            want = None
        got = parse_mentions(p)
        if want is None:
            assert got is None, (trial, content)
        elif got is not None:
            docs, di, ci, mi, fi, la = got
            assert len(ci) == len(want), (trial, content)
            for k, m in enumerate(want):
                assert (docs[di[k]], ci[k], mi[k], fi[k], la[k]) == \
                    (m.img_id, m.cap_idx, m.mention_idx, m.first, m.last), \
                    (trial, content)
        try:
            pw = set()
            for c in read_captions(p).values():
                pw.update(c.tokens)
        except ValueError:
            pw = None
        gw = caption_words(p)
        if pw is None:
            assert gw is None, (trial, content)
        elif gw is not None:
            assert gw == pw, (trial, content)
