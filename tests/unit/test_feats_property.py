"""Property-based round-trips for the Java-facing formats (SURVEY §6.1–6.2).

The `.feats`/`.scores` byte formats are the compatibility surface the Java
ILP depends on; hypothesis hammers the writer→parser loop (both Python and
C++ paths) with adversarial ids, labels, and sparse structures.
"""

import numpy as np
from hypothesis import given, settings, strategies as st

from icl.io.feats import FeatsExample, read_feats, write_feats
from icl.io.scores import read_scores, write_scores

# ids must be newline/comma-free and not start/end with spaces (the trailing
# "# <id>" comment strips surrounding whitespace); the real id schemes are
# doc:...;caption:... so this generalizes them
_id_alphabet = st.characters(
    whitelist_categories=("L", "N", "P", "S"),
    blacklist_characters=",\n\r#")
_ids = st.text(_id_alphabet, min_size=1, max_size=40).map(str.strip).filter(
    lambda s: s and "#" not in s and "," not in s)

_finite_f32 = st.floats(min_value=-1e6, max_value=1e6,
                        allow_nan=False, allow_infinity=False, width=32)


@st.composite
def _examples(draw):
    n = draw(st.integers(1, 6))
    idx = draw(st.lists(st.integers(1, 10_000), min_size=n, max_size=n,
                        unique=True))
    vals = draw(st.lists(_finite_f32, min_size=n, max_size=n))
    return FeatsExample(
        example_id=draw(_ids),
        label=float(draw(st.integers(-5, 11) | _finite_f32)),
        indices=np.asarray(idx, np.int32),
        values=np.asarray(vals, np.float32))


@settings(max_examples=60, deadline=None)
@given(st.lists(_examples(), min_size=1, max_size=8))
def test_feats_roundtrip_property(tmp_path_factory, rows):
    p = str(tmp_path_factory.mktemp("prop") / "t.feats")
    write_feats(p, rows)
    for use_native in (False, True):
        back = read_feats(p, use_native=use_native)
        assert len(back) == len(rows)
        for a, b in zip(rows, back):
            assert a.example_id == b.example_id
            assert np.float32(a.label) == np.float32(b.label) or \
                abs(a.label - b.label) <= 1e-6 * max(1.0, abs(a.label))
            assert a.indices.tolist() == b.indices.tolist()
            np.testing.assert_array_equal(a.values, b.values)  # exact f32


@settings(max_examples=40, deadline=None)
@given(ids=st.lists(_ids, min_size=1, max_size=6, unique=True),
       ncls=st.integers(2, 12), seed=st.integers(0, 2**31))
def test_scores_roundtrip_property(tmp_path_factory, ids, ncls, seed):
    rng = np.random.default_rng(seed)
    probs = rng.random((len(ids), ncls))
    probs /= probs.sum(1, keepdims=True)
    p = str(tmp_path_factory.mktemp("prop") / "t.scores")
    write_scores(p, ids, probs)
    rids, rprobs = read_scores(p)
    assert rids == list(ids)
    np.testing.assert_allclose(rprobs, probs, atol=5.1e-7)  # 6-dp rounding
