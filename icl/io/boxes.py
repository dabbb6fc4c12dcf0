"""VGG-16 fc7 box-feature loader (component C5).

Reference parity: SURVEY.md §3.1 C5 — the Java side exports precomputed
VGG-16 fc7 features (4096-d) per candidate bounding box per image; the Python
side only consumes them (the CNN itself is outside both repos' scope).

On-disk contract (DECISION, SURVEY.md §0):

* fast path — ``<split>.boxes.npz`` with arrays ``ids`` (unicode, box ids in
  the §6.1 scheme ``doc:<imgid>.jpg;box:<bi>``) and ``feats``
  (float32[N, 4096]);
* text path — one box per line: ``<box_id> v1 v2 ... v4096`` whitespace-
  separated (the Java-era export shape), auto-detected by extension.

Box ids group by image via the ``doc:`` prefix; :func:`group_boxes_by_image`
gives the per-image candidate sets the affinity model ranks over.
"""

from __future__ import annotations

import re

import numpy as np

_BOX_ID_RE = re.compile(r"doc:(?P<doc>[^;]+);box:(?P<box>\d+)$")

FC7_DIM = 4096


def parse_box_id(box_id: str) -> tuple[str, int]:
    m = _BOX_ID_RE.match(box_id)
    if not m:
        raise ValueError(f"bad box id: {box_id!r}")
    return m.group("doc"), int(m.group("box"))


def make_box_id(img_id: str, box_idx: int) -> str:
    return f"doc:{img_id};box:{box_idx}"


def read_box_feats(path: str) -> tuple[list[str], np.ndarray]:
    """Load (box_ids, float32[N, D]) from .npz (fast) or text format."""
    if path.endswith(".npz"):
        with np.load(path) as z:
            ids = [str(s) for s in z["ids"]]
            feats = np.asarray(z["feats"], dtype=np.float32)
        return ids, feats
    ids = []
    rows = []
    with open(path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            first, _, rest = line.partition(" ")
            ids.append(first)
            rows.append(np.array(rest.split(), dtype=np.float32))
    return ids, np.stack(rows) if rows else np.zeros((0, FC7_DIM), np.float32)


def write_box_feats(path: str, ids: list[str], feats: np.ndarray) -> None:
    feats = np.asarray(feats, dtype=np.float32)
    if path.endswith(".npz"):
        with open(path, "wb") as f:
            np.savez_compressed(f, ids=np.array(ids), feats=feats)
        return
    with open(path, "w", encoding="utf-8") as f:
        for bid, row in zip(ids, feats):
            f.write(bid + " " + " ".join(f"{v:.6g}" for v in row) + "\n")


def group_boxes_by_image(ids: list[str], feats: np.ndarray) -> dict[str, tuple[list[int], np.ndarray]]:
    """Group to {img_id: (box_indices_in_image_order, float32[B, D])}."""
    by_img: dict[str, list[tuple[int, int]]] = {}
    for row, bid in enumerate(ids):
        img, b = parse_box_id(bid)
        by_img.setdefault(img, []).append((b, row))
    out: dict[str, tuple[list[int], np.ndarray]] = {}
    for img, pairs in by_img.items():
        pairs.sort()
        box_idx = [b for b, _ in pairs]
        rows = [r for _, r in pairs]
        out[img] = (box_idx, feats[rows])
    return out
