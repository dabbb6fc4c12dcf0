""".scores writer/reader (component C2) — the Java-ILP-facing output format.

Reference parity: SURVEY.md §6.2 (frozen contract).  One line per example::

    <example_id>,<p_0>,<p_1>[,<p_2>,<p_3>]

comma-separated natural probabilities in fixed class order (class orders are
pinned per task in SURVEY.md §6.3–6.5), 6 decimal places.  A sibling
``<path>.meta.json`` records class order / model hash / git sha — additive,
so a Java reader that consumes only the first file is unaffected.

Determinism contract (SURVEY.md §7.3): two runs of this pipeline with the same
seed/config must produce bitwise-identical `.scores` bytes; formatting here is
the last link in that chain, hence the explicit ``%.6f`` and ``\n`` pins.
"""

from __future__ import annotations

import json
import os
import subprocess
from typing import Sequence

import numpy as np


def write_scores(
    path: str,
    ids: Sequence[str],
    probs: np.ndarray,
    class_order: Sequence[str] | None = None,
    meta: dict | None = None,
) -> None:
    """Write probabilities in the §6.2 byte format (+ sibling meta json).

    Args:
      path: output `.scores` path.
      ids: example ids, length N.
      probs: float array [N, C] of natural probabilities.
      class_order: class names in column order, recorded in the meta file.
      meta: extra metadata merged into the meta file.
    """
    probs = np.asarray(probs, dtype=np.float64)
    if probs.ndim != 2 or probs.shape[0] != len(ids):
        raise ValueError(f"probs shape {probs.shape} does not match {len(ids)} ids")
    wrote = False
    try:
        # C++ fast path (byte-identical to the Python loop; tested)
        from icl.native.feats import write_scores_native

        wrote = write_scores_native(path, list(ids), probs)
    except Exception:
        wrote = False
    if not wrote:
        with open(path, "w", encoding="utf-8", newline="\n") as f:
            for eid, row in zip(ids, probs):
                f.write(eid + "," + ",".join(f"{p:.6f}" for p in row) + "\n")
    info = {"num_examples": len(ids), "num_classes": int(probs.shape[1])}
    if class_order is not None:
        info["class_order"] = list(class_order)
    if meta:
        info.update(meta)
    try:
        # provenance = the CODE repo that wrote the scores, so resolve git
        # from this module's location — the output path may live inside a
        # separately-versioned data mount whose HEAD is meaningless here
        sha = subprocess.run(
            ["git", "rev-parse", "HEAD"], capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)), timeout=5,
        ).stdout.strip()
        if sha:
            info["git_sha"] = sha
    except Exception:
        pass
    with open(path + ".meta.json", "w", encoding="utf-8") as f:
        json.dump(info, f, indent=2, sort_keys=True)
        f.write("\n")


def read_scores(path: str) -> tuple[list[str], np.ndarray]:
    """Read a `.scores` file back into (ids, float64[N,C]).

    Ids may themselves contain commas only if they do not parse as floats;
    the §6.1 id schemes (``doc:...;caption:...;mention:...``) are comma-free,
    so the first field is always the id.
    """
    ids: list[str] = []
    rows: list[list[str]] = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.rstrip("\n")
            if not line:
                continue
            eid, sep, rest = line.partition(",")
            ids.append(eid)
            # when a separator was present, split unconditionally: a line
            # "id," is one EMPTY field and must fail float('') like the
            # original per-field loop did, not silently become a zero-field
            # row (ADVICE r3)
            rows.append(rest.split(",") if sep else [])
    try:
        # numpy parses the string fields directly (same strtod grammar as
        # %.6f round-trips need) — ~3x faster than per-field float() at
        # MSCOCO scale (2.3M rows)
        return ids, np.asarray(rows, dtype=np.float64)
    except ValueError:
        # ragged rows or Python-only numeric grammar: the float() loop
        # reproduces the original per-field behavior/errors
        return ids, np.asarray([[float(p) for p in r] for r in rows],
                               dtype=np.float64)
