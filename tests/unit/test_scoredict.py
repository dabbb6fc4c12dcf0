"""ScoreDict vs hand-computed P/R/F1 (SURVEY §7.2)."""

from icl.eval.scoredict import ScoreDict


def test_hand_computed():
    sd = ScoreDict(labels=["a", "b"])
    golds = ["a", "a", "a", "b", "b"]
    preds = ["a", "a", "b", "b", "a"]
    sd.increment_all(golds, preds)
    # label a: pred 3 times, correct 2 → P=2/3; gold 3 → R=2/3; F1=2/3
    assert abs(sd.precision("a") - 2 / 3) < 1e-12
    assert abs(sd.recall("a") - 2 / 3) < 1e-12
    assert abs(sd.f1("a") - 2 / 3) < 1e-12
    # label b: pred 2, correct 1 → P=0.5; gold 2 → R=0.5
    assert sd.precision("b") == 0.5 and sd.recall("b") == 0.5
    assert sd.accuracy == 3 / 5
    assert abs(sd.macro_f1() - (2 / 3 + 0.5) / 2) < 1e-12


def test_zero_denominators():
    sd = ScoreDict(labels=[0, 1])
    sd.increment(0, 0)
    assert sd.precision(1) == 0.0 and sd.recall(1) == 0.0 and sd.f1(1) == 0.0


def test_state_dict_merge_equals_combined():
    """Sharded --eval contract: merging per-shard state_dicts (through a
    JSON round-trip, as the part files do) reproduces the table a single
    ScoreDict over ALL pairs would print — counts are additive."""
    import json

    golds = ["a", "a", "a", "b", "b", "a", "b"]
    preds = ["a", "b", "a", "b", "a", "a", "b"]
    full = ScoreDict(labels=["a", "b"])
    full.increment_all(golds, preds)
    merged = ScoreDict(labels=["a", "b"])
    for lo, hi in ((0, 3), (3, 7)):   # two uneven "process" shards
        shard = ScoreDict(labels=["a", "b"])
        shard.increment_all(golds[lo:hi], preds[lo:hi])
        merged.update_state(json.loads(json.dumps(shard.state_dict())))
    assert merged.table() == full.table()
    assert merged.accuracy == full.accuracy


def test_state_dict_merge_tuple_labels():
    """Non-string labels survive the JSON round-trip: pair lists re-tuple
    on update_state so they hash identically to the originals."""
    import json

    sd = ScoreDict()
    sd.increment(("doc", 1), ("doc", 1))
    sd.increment(("doc", 2), ("doc", 1))
    out = ScoreDict()
    out.update_state(json.loads(json.dumps(sd.state_dict())))
    assert out.accuracy == 0.5
    assert out.recall(("doc", 1)) == 1.0


def test_state_dict_merge_nested_tuple_labels():
    """Re-tupling is RECURSIVE: a nested-tuple label must round-trip to
    the same hash, not keep an inner list that silently splits counts
    (r4 advisor finding)."""
    import json

    sd = ScoreDict()
    sd.increment(("doc", (1, 2)), ("doc", (1, 2)))
    out = ScoreDict()
    out.increment(("doc", (1, 2)), ("doc", (1, 2)))
    out.update_state(json.loads(json.dumps(sd.state_dict())))
    assert out.gold_count(("doc", (1, 2))) == 2
    assert out.accuracy == 1.0
    assert out.labels == [("doc", (1, 2))]   # one label, not a split pair


def test_table_stable():
    sd = ScoreDict(labels=["coref", "null"])
    for _ in range(3):
        sd.increment("coref", "coref")
    sd.increment("null", "coref")
    t = sd.table()
    assert "coref" in t and "Accuracy: 75.00% (3/4)" in t
    # pinned column layout
    assert t.splitlines()[0].startswith("label        |")
