"""bench.py --full must carry forward EVERY hand-maintained BENCHMARKS.md
section.  An allowlist of known titles (ledger + scale rehearsal) silently
deleted the four r5 sections (flagship run, checkpoint wall, serve
throughput, DP scaling model) when --full next regenerated the file — the
preservation is now subtractive: everything except the sections the script
itself generates survives, in order."""

import os

from bench import _preserved_hand_sections

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def test_all_current_hand_sections_survive():
    with open(os.path.join(os.path.dirname(__file__), "..", "..",
                           "BENCHMARKS.md")) as f:
        doc = f.read()
    kept = _preserved_hand_sections(doc)
    for title in ("## Optimization ledger", "## Scale rehearsal",
                  "## Flagship run", "## Multi-process checkpoint wall",
                  "## Serve throughput", "## DP scaling model"):
        assert title in doc, f"{title} missing from BENCHMARKS.md itself"
        assert title in kept, f"{title} dropped by regeneration"
    for generated in ("## Precision policy", "## Timing methodology",
                      "## Parity"):
        assert generated not in kept, generated


def test_unknown_future_sections_survive_in_order():
    doc = ("# Benchmarks\n\nheader\n\n"
           "## Precision policy (measured)\n\ngen\n\n"
           "## Optimization ledger (relation)\n\n| a |\n\n"
           "## Some Future Record (r9)\n\nnumbers\n\n"
           "## Timing methodology\n\ngen\n\n"
           "## Parity\n\ngen\n")
    kept = _preserved_hand_sections(doc)
    i = kept.index("## Optimization ledger")
    j = kept.index("## Some Future Record")
    assert 0 <= i < j
    assert "Precision policy" not in kept
    assert "numbers" in kept


def test_empty_doc_falls_back_to_pointer():
    kept = _preserved_hand_sections("")
    assert "git history" in kept
