"""Dataset assembly: files → padded index-table datasets (layer L3).

Reference parity: SURVEY.md §4.1–4.4.  The reference assembled per-example
feature vectors inside Python loops at train time; here each split is turned
once, on host, into dense numpy tables that jit-compiled programs consume
with static shapes:

* **mention datasets** (nonvisual / cardinality): flat ``[N, L]`` token-id
  rows per mention — SURVEY §4.4.
* **relation datasets**: *image-centric* — captions ``[I, C, L]``, mention
  span tables ``[I, M]``, pair index tables ``[I, P]``.  Each caption is
  encoded exactly once per step (the reference re-embedded both captions for
  every one of the O(M²) pairs); pairs are formed on-device from mention
  indices (XLA gather or Pallas K1) — SURVEY §4.1, §9.3(3).
* **affinity datasets**: image-centric grids — phrases ``[I, M, L]`` ×
  boxes ``[I, B, 4096]`` with a dense ``[I, M, B]`` label/valid grid, so the
  affinity head runs as two GEMMs + broadcast-add instead of per-pair concat
  (the K2 restructuring, SURVEY §4.3).

Data-dir layout (DECISION, SURVEY §0 — reference checkout empty):
``<split>.captions.txt``, ``<split>.mentions.txt``, ``<split>.<task>.feats``,
``<split>.boxes.npz``; embeddings via an explicit path.

Affinity example-id scheme (DECISION):
``doc:<img>;caption:<ci>;mention:<mi>;box:<bi>`` — consistent with §6.1.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from array import array

import numpy as np

from icl.data.embeddings import EmbeddingStore
from icl.io.boxes import group_boxes_by_image, read_box_feats
from icl.io.captions import (Mention, make_pair_id, parse_pair_id_padded,
                             read_captions, read_mentions)
from icl.io.feats import read_feats_labels

# affinity id grammar (implemented by hand below, see icl.io.captions):
#   doc:(?P<doc>[^;]+);caption:(\d+);mention:(\d+);box:(\d+)$


def parse_affinity_id(example_id: str) -> tuple[str, int, int, int]:
    img, ci, mi, bi, _ = parse_affinity_id_padded(example_id)
    return img, ci, mi, bi


def parse_affinity_id_padded(
        example_id: str) -> tuple[str, int, int, int, bool]:
    """Manual parse of the affinity id grammar (3-4x faster at MSCOCO
    scale, see icl.io.captions) plus the zero-padded-field flag — padded
    ids don't round-trip re-serialization and take the exact-bytes
    override path below."""
    if example_id.startswith("doc:"):
        doc, s1, rest = example_id[4:].partition(";caption:")
        ci, s2, rest = rest.partition(";mention:")
        mi, s3, bi = rest.partition(";box:")
        if (s1 and s2 and s3 and doc and ";" not in doc
                and ci.isdigit() and mi.isdigit() and bi.isdigit()
                and (ci + mi + bi).isascii()):
            return (doc, int(ci), int(mi), int(bi),
                    (ci != "0" and ci[0] == "0")
                    or (mi != "0" and mi[0] == "0")
                    or (bi != "0" and bi[0] == "0"))
    raise ValueError(f"bad affinity id: {example_id!r}")


def make_affinity_id(img_id: str, ci: int, mi: int, bi: int) -> str:
    return f"doc:{img_id};caption:{ci};mention:{mi};box:{bi}"


# The id grammar is rigid (fixed field names/separators; the doc field is
# copied verbatim), so the ONLY way a valid id can differ from its
# canonical re-serialization is a zero-padded numeric field (":007") —
# which the parse_*_padded parsers flag for free during field validation.
# Flagged rows store the file's exact bytes as an override: predict must
# emit those bytes — the downstream join (gold `.feats` vs written
# `.scores`, SURVEY §6.2) is on raw strings.


def split_path(data_dir: str, split: str, what: str) -> str:
    return os.path.join(data_dir, f"{split}.{what}")


# ---------------------------------------------------------------------------
# Mention-level datasets (nonvisual, cardinality)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class MentionDataset:
    """Flat per-mention dataset: token ids + true length + label + id."""

    token_ids: np.ndarray    # int32[N, L]
    lengths: np.ndarray      # int32[N]
    labels: np.ndarray       # int32[N]
    ids: list[str]

    @property
    def max_len(self) -> int:
        return self.token_ids.shape[1]


def load_mention_dataset(
    data_dir: str, split: str, task: str, emb: EmbeddingStore, max_len: int = 16,
) -> MentionDataset:
    """Join <split>.<task>.feats labels with mention token spans.

    Labels-only `.feats` read: the sparse feature columns feed the sklearn
    baseline alone (SURVEY §4.4), so the loaders skip them entirely."""
    ids, flabels = read_feats_labels(
        split_path(data_dir, split, f"{task}.feats"))
    captions = read_captions(split_path(data_dir, split, "captions.txt"))
    mentions = {m.mention_id: m for m in
                read_mentions(split_path(data_dir, split, "mentions.txt"))}
    n = len(ids)
    token_ids = np.zeros((n, max_len), dtype=np.int32)
    lengths = np.zeros(n, dtype=np.int32)
    labels = flabels.astype(np.int32)
    for r, eid in enumerate(ids):
        m = mentions[eid]
        toks = captions[m.caption_key].tokens[m.first:m.last + 1]
        token_ids[r], lengths[r] = emb.encode_tokens(toks, max_len)
    return MentionDataset(token_ids, lengths, labels, ids)


# ---------------------------------------------------------------------------
# Relation dataset (image-centric)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class RelationImage:
    """One image's caption/mention/pair tables, unpadded."""

    img_id: str
    tokens: np.ndarray       # int32[C, L_img] (L_img = max caption len here)
    tok_len: np.ndarray      # int32[C]
    m_cap: np.ndarray        # int32[M] caption row of each mention
    m_first: np.ndarray      # int32[M]
    m_last: np.ndarray       # int32[M]
    pair_ij: np.ndarray      # int32[P, 2] mention-row pairs
    pair_label: np.ndarray   # int32[P]
    pair_key: np.ndarray     # int32[P, 4] original (ci, mi, cj, mj) indices
    # rare non-canonical feats ids (zero-padded fields), row → exact string
    pair_id_overrides: dict[int, str] | None = None

    @functools.cached_property
    def pair_ids(self) -> list[str]:
        """§6.1 pair-id strings, derived on demand from ``pair_key``.

        Ids feed only `.scores` writing at predict; a training split never
        materializes them (≈90 bytes/string × millions of pairs at MSCOCO
        scale — the dataset stores 16 bytes of ints instead, VERDICT r2
        missing#2).  Cached once touched: predict derives them up to three
        times (batcher ids, parity audit, write order) and training never
        touches the property, so the bound is unaffected.  Overrides
        restore the file's exact bytes for non-canonical ids."""
        ids = [make_pair_id(self.img_id, ci, mi, cj, mj)
               for ci, mi, cj, mj in self.pair_key.tolist()]
        if self.pair_id_overrides:
            for r, s in self.pair_id_overrides.items():
                ids[r] = s
        return ids


@dataclasses.dataclass
class RelationDataset:
    images: list[RelationImage]

    @property
    def num_pairs(self) -> int:
        return sum(len(im.pair_label) for im in self.images)


def load_relation_dataset(
    data_dir: str, split: str, emb: EmbeddingStore,
) -> RelationDataset:
    """Build image-centric tables from <split>.relation.feats + captions.

    Scale posture (VERDICT r2 missing#2): the `.feats` read is labels-only
    (no sparse-column materialization), per-image pair rows accumulate into
    compact ``array('i')`` buffers (20 bytes/pair instead of a tuple-of-ints
    per pair), and pair-id strings are never stored — ``RelationImage.
    pair_ids`` derives them on demand.  Bounded-memory behavior is asserted
    by tests/unit/test_scale_loading.py."""
    ids, flabels = read_feats_labels(
        split_path(data_dir, split, "relation.feats"))
    captions = read_captions(split_path(data_dir, split, "captions.txt"))
    all_mentions = read_mentions(split_path(data_dir, split, "mentions.txt"))

    mentions_by_img: dict[str, list[Mention]] = {}
    for m in all_mentions:
        mentions_by_img.setdefault(m.img_id, []).append(m)

    # gold (ci, mi, cj, mj, label) rows per image, int-packed
    labels_by_img: dict[str, array] = {}
    overrides_by_img: dict[str, dict[int, str]] = {}
    for eid, lbl in zip(ids, flabels):
        img, ci, mi, cj, mj, padded = parse_pair_id_padded(eid)
        rows = labels_by_img.get(img)
        if rows is None:
            rows = labels_by_img.setdefault(img, array("i"))
        if padded:
            overrides_by_img.setdefault(img, {})[len(rows) // 5] = eid
        rows.extend((ci, mi, cj, mj, int(lbl)))
    del ids, flabels

    images: list[RelationImage] = []
    for img_id in sorted(labels_by_img):
        ms = sorted(mentions_by_img.get(img_id, []),
                    key=lambda m: (m.cap_idx, m.mention_idx))
        if not ms:
            raise ValueError(f"no mentions for image {img_id} with relation pairs")
        cap_keys = sorted({m.caption_key for m in ms},
                          key=lambda k: int(k.rpartition("#")[2]))
        cap_row = {k: i for i, k in enumerate(cap_keys)}
        L = max(len(captions[k].tokens) for k in cap_keys)
        tokens = np.zeros((len(cap_keys), L), dtype=np.int32)
        tok_len = np.zeros(len(cap_keys), dtype=np.int32)
        for k, row in cap_row.items():
            tokens[row], tok_len[row] = emb.encode_tokens(captions[k].tokens, L)
        mrow = {(m.cap_idx, m.mention_idx): i for i, m in enumerate(ms)}
        m_cap = np.array([cap_row[m.caption_key] for m in ms], dtype=np.int32)
        m_first = np.array([min(m.first, int(tok_len[cap_row[m.caption_key]]) - 1)
                            for m in ms], dtype=np.int32)
        m_last = np.array([min(m.last, int(tok_len[cap_row[m.caption_key]]) - 1)
                           for m in ms], dtype=np.int32)
        rows = np.frombuffer(labels_by_img[img_id], dtype=np.int32
                             ).reshape(-1, 5)
        pair_key = np.ascontiguousarray(rows[:, :4])
        pair_ij = np.array([[mrow[(ci, mi)], mrow[(cj, mj)]]
                            for ci, mi, cj, mj in pair_key.tolist()],
                           dtype=np.int32).reshape(-1, 2)
        pair_label = np.ascontiguousarray(rows[:, 4])
        images.append(RelationImage(
            img_id=img_id, tokens=tokens, tok_len=tok_len, m_cap=m_cap,
            m_first=m_first, m_last=m_last, pair_ij=pair_ij,
            pair_label=pair_label, pair_key=pair_key,
            pair_id_overrides=overrides_by_img.get(img_id)))
    return RelationDataset(images=images)


# ---------------------------------------------------------------------------
# Affinity dataset (image-centric mention × box grids)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class AffinityImage:
    img_id: str
    phrase_tokens: np.ndarray  # int32[M, L]
    phrase_len: np.ndarray     # int32[M]
    mention_ids: list[str]     # §6.1 mention ids, row order
    box_feats: np.ndarray      # float32[B, D]
    box_idx: list[int]         # original box indices, row order
    grid_label: np.ndarray     # int32[M, B]
    grid_valid: np.ndarray     # bool[M, B] — cells present in the .feats file
    # rare non-canonical feats ids (zero-padded fields): (ci,mi,bi) → bytes
    cell_id_overrides: dict[tuple[int, int, int], str] | None = None

    def cell_id(self, ci: int, mi: int, bi: int) -> str:
        """§6.1 cell id for (caption, mention, box) — the file's exact
        bytes when the feats id was non-canonical (zero-padded fields)."""
        if self.cell_id_overrides:
            ov = self.cell_id_overrides.get((ci, mi, bi))
            if ov is not None:
                return ov
        return make_affinity_id(self.img_id, ci, mi, bi)


@dataclasses.dataclass
class AffinityDataset:
    images: list[AffinityImage]
    box_dim: int

    @property
    def num_cells(self) -> int:
        return sum(int(im.grid_valid.sum()) for im in self.images)


def load_affinity_dataset(
    data_dir: str, split: str, emb: EmbeddingStore, max_phrase_len: int = 16,
) -> AffinityDataset:
    """Labels-only `.feats` read + int-packed per-image cell buffers +
    mmap'd lazy box views — same scale posture as load_relation_dataset."""
    ids, flabels = read_feats_labels(
        split_path(data_dir, split, "affinity.feats"))
    captions = read_captions(split_path(data_dir, split, "captions.txt"))
    all_mentions = {m.mention_id: m for m in
                    read_mentions(split_path(data_dir, split, "mentions.txt"))}
    # memory-mapped + lazy per-image views (SURVEY §4.3): feature bytes are
    # paged in only when a batch containing the image is actually assembled
    box_ids, box_arr = read_box_feats(
        split_path(data_dir, split, "boxes.npz"), mmap=True)
    boxes_by_img = group_boxes_by_image(box_ids, box_arr, lazy=True)

    cells: dict[str, array] = {}
    cell_overrides: dict[str, dict[tuple[int, int, int], str]] = {}
    for eid, lbl in zip(ids, flabels):
        img, ci, mi, bi, padded = parse_affinity_id_padded(eid)
        rows = cells.get(img)
        if rows is None:
            rows = cells.setdefault(img, array("i"))
        if padded:
            cell_overrides.setdefault(img, {})[(ci, mi, bi)] = eid
        rows.extend((ci, mi, bi, int(lbl)))
    del ids, flabels

    images: list[AffinityImage] = []
    box_dim = box_arr.shape[1] if box_arr.size else 4096
    for img_id in sorted(cells):
        img_cells = np.frombuffer(cells[img_id], dtype=np.int32
                                  ).reshape(-1, 4).tolist()
        box_order, bfeats = boxes_by_img[img_id]
        box_col = {b: c for c, b in enumerate(box_order)}
        mention_keys = sorted({(ci, mi) for ci, mi, _, _ in img_cells})
        mrow = {k: r for r, k in enumerate(mention_keys)}
        M, B = len(mention_keys), len(box_order)
        phrase_tokens = np.zeros((M, max_phrase_len), dtype=np.int32)
        phrase_len = np.zeros(M, dtype=np.int32)
        mention_ids = []
        for (ci, mi), r in mrow.items():
            mid = f"doc:{img_id};caption:{ci};mention:{mi}"
            m = all_mentions[mid]
            toks = captions[m.caption_key].tokens[m.first:m.last + 1]
            phrase_tokens[r], phrase_len[r] = emb.encode_tokens(toks, max_phrase_len)
            mention_ids.append(mid)
        grid_label = np.zeros((M, B), dtype=np.int32)
        grid_valid = np.zeros((M, B), dtype=bool)
        for ci, mi, bi, lbl in img_cells:
            r, c = mrow[(ci, mi)], box_col[bi]
            grid_label[r, c] = lbl
            grid_valid[r, c] = True
        images.append(AffinityImage(
            img_id=img_id, phrase_tokens=phrase_tokens, phrase_len=phrase_len,
            mention_ids=mention_ids, box_feats=bfeats, box_idx=box_order,
            grid_label=grid_label, grid_valid=grid_valid,
            cell_id_overrides=cell_overrides.get(img_id)))
    return AffinityDataset(images=images, box_dim=box_dim)
