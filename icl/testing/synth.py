"""Synthetic Flickr30k-Entities-shaped dataset generator for tests/benchmarks.

The reference ships no fixtures or tests (SURVEY §7.1 — the upstream repo has
no test suite), so the rebuild's golden fixtures are synthetic but exercise
every format feature of SURVEY §6.1–6.2: sparse unordered indices, float and
int labels, comments/blank lines, all three example-id schemes, variable
caption lengths / mention counts / box counts.

Labels are generated with *learnable structure* (word identity determines
label tendencies) so integration tests can assert loss decreases and models
beat chance on held-out data.
"""

from __future__ import annotations

import dataclasses
import os
import zlib

import numpy as np

from icl.data.pipeline import make_affinity_id
from icl.io.boxes import make_box_id, write_box_feats
from icl.io.captions import Caption, Mention, make_pair_id, write_captions, write_mentions
from icl.io.feats import FeatsExample, write_feats


@dataclasses.dataclass
class SynthConfig:
    num_images: int = 12
    captions_per_image: int = 5
    vocab_size: int = 60
    emb_dim: int = 32            # small stand-in for the 300-d GoogleNews table
    min_caption_len: int = 4
    max_caption_len: int = 14
    max_mentions_per_caption: int = 3
    max_boxes_per_image: int = 6
    seed: int = 0
    # planted=True makes every task label a DETERMINISTIC function of the
    # observable features (entity word / box signature), so trained models
    # can be gated on held-out accuracy targets (VERDICT r3 weak#1) instead
    # of loss trends.  Default keeps the historical noisy-tendency labels:
    #  - entity words per image are drawn WITHOUT replacement (coref =
    #    same-word becomes exact, no cross-entity word collisions),
    #  - relation: coref iff w_i == w_j; subset_ij iff (w_i even, w_j odd);
    #    subset_ji iff (w_i odd, w_j even); else null — a pure function of
    #    the two span head words separately (a successor-style JOINT rule
    #    was piloted and rejected: it gates pair-space memorization, not
    #    learning — 0.88 vs 0.98 dev accuracy; see the planted branch),
    #  - affinity: every image has exactly max_boxes_per_image boxes and
    #    the entity's box is entity_word % n_boxes — a pure function of
    #    (span word, box signature),
    #  - nonvisual was already planted (top-half-vocab head word),
    #  - cardinality: 0 for nonvisual mentions, else 1 + (word % 2) — the
    #    default's 1 + (entity_index % 2) is NOT observable (the same word
    #    can be entity 0 in one image and entity 1 in another).
    planted: bool = False
    # Skewed-class planted relations (SURVEY §6.4: null dominates ~0.9 of
    # pairs in the real data).  When set (planted mode only), only pairs
    # whose BOTH span head words fall among the first N entity words get a
    # non-null label: same word → coref, wi<wj → subset_ij, wi>wj →
    # subset_ji; every other pair is null.  Still a deterministic function
    # of the observable words (a model that learns N word identities and
    # their order generalizes to held-out pairs), but with N=3 of 8 entity
    # words the class mass lands at ~0.89 null / 0.08 coref / ~0.02+0.01
    # subsets — the regime where unweighted CE collapses to the null prior
    # and the production class weighting (--null_weight) must rescue
    # minority recall.  None keeps the near-balanced parity rule above.
    planted_active_words: int | None = None


def _make_vocab(cfg: SynthConfig) -> list[str]:
    return [f"w{i:03d}" for i in range(cfg.vocab_size)]


def generate_dataset(data_dir: str, split: str = "train",
                     cfg: SynthConfig | None = None) -> dict:
    """Write a full synthetic split into data_dir; returns summary counts."""
    cfg = cfg or SynthConfig()
    # stable split salt: hash() is process-salted (PYTHONHASHSEED), which
    # would make "golden" fixtures irreproducible across runs
    rng = np.random.default_rng(
        cfg.seed + (zlib.crc32(split.encode()) % 1000))
    os.makedirs(data_dir, exist_ok=True)
    words = _make_vocab(cfg)

    # embeddings (one file per dir, shared by splits) — word2vec text format
    emb_path = os.path.join(data_dir, "embeddings.txt")
    # cache keyed on the header: a second split generated with a larger
    # vocab/dim must not silently reuse a stale, too-small table
    if os.path.exists(emb_path):
        with open(emb_path, "r", encoding="utf-8") as f:
            if f.readline().strip() != f"{cfg.vocab_size} {cfg.emb_dim}":
                os.remove(emb_path)
    if not os.path.exists(emb_path):
        emb_rng = np.random.default_rng(cfg.seed)
        vecs = emb_rng.normal(size=(cfg.vocab_size, cfg.emb_dim)).astype(np.float32)
        with open(emb_path, "w", encoding="utf-8") as f:
            f.write(f"{cfg.vocab_size} {cfg.emb_dim}\n")
            for w, v in zip(words, vecs):
                f.write(w + " " + " ".join(f"{x:.6f}" for x in v) + "\n")

    captions: list[Caption] = []
    mentions: list[Mention] = []
    nonvis_rows: list[FeatsExample] = []
    card_rows: list[FeatsExample] = []
    rel_rows: list[FeatsExample] = []
    aff_rows: list[FeatsExample] = []
    box_ids: list[str] = []
    box_feats: list[np.ndarray] = []

    for n in range(cfg.num_images):
        img_id = f"{split}_{n:04d}.jpg"
        img_mentions: list[Mention] = []
        # each image has a set of "entities"; mentions referring to the same
        # entity share a word prefix bucket, making coref learnable
        n_entities = int(rng.integers(2, 5))
        if cfg.planted:
            entity_words = rng.choice(cfg.vocab_size // 2, size=n_entities,
                                      replace=False)
            n_boxes = cfg.max_boxes_per_image
            entity_box = entity_words % n_boxes
        else:
            entity_words = rng.integers(0, cfg.vocab_size // 2,
                                        size=n_entities)
            n_boxes = int(rng.integers(2, cfg.max_boxes_per_image + 1))
            entity_box = rng.integers(0, n_boxes, size=n_entities)

        for ci in range(cfg.captions_per_image):
            length = int(rng.integers(cfg.min_caption_len, cfg.max_caption_len + 1))
            toks = [words[int(t)] for t in rng.integers(0, cfg.vocab_size, size=length)]
            n_m = int(rng.integers(1, cfg.max_mentions_per_caption + 1))
            spans = sorted(rng.choice(length, size=min(n_m, length), replace=False).tolist())
            # choose spans/words first, then record mention text, so later
            # token overwrites can't change an already-recorded span
            planned = []
            prev_last = -1
            for mi, start in enumerate(spans):
                ent = int(rng.integers(0, n_entities))
                # nonvisual mentions use the top half of the vocab
                nonvis = bool(rng.random() < 0.25)
                w = (int(rng.integers(cfg.vocab_size // 2, cfg.vocab_size)) if nonvis
                     else int(entity_words[ent]))
                toks[start] = words[w]
                # planted mode: single-token spans — a random second token
                # would pollute the span's word identity, which IS the label
                end = (start if cfg.planted
                       else min(start + int(rng.integers(0, 2)), length - 1))
                # clamp below the next span start (spans are sorted and
                # distinct, so prior clamps already keep prev_last < start)
                if mi + 1 < len(spans) and end >= spans[mi + 1]:
                    end = start
                end = max(start, end)
                prev_last = end
                planned.append((mi, start, end, -1 if nonvis else ent, nonvis))
            cap_ments = []
            for mi, start, end, ent, nonvis in planned:
                m = Mention(img_id=img_id, cap_idx=ci, mention_idx=mi,
                            first=start, last=end,
                            text=" ".join(toks[start:end + 1]))
                m._entity = ent  # type: ignore[attr-defined]
                cap_ments.append(m)
                lbl = 1 if nonvis else 0
                nonvis_rows.append(_sparse_row(rng, m.mention_id, lbl))
                # planted: a function of the OBSERVABLE head word (module
                # comment) — the entity index is per-image bookkeeping.
                # NB: look the word up from ent; the planning loop's `w`
                # is stale here (it holds the LAST mention's word)
                card = (0 if nonvis
                        else int(1 + (int(entity_words[ent]) % 2))
                        if cfg.planted
                        else int(1 + (ent % 2)))
                card_rows.append(_sparse_row(rng, m.mention_id, card))
            captions.append(Caption(img_id=img_id, cap_idx=ci, tokens=toks))
            mentions.extend(cap_ments)
            img_mentions.extend(cap_ments)

        # relation pairs: coref if same entity; subset occasionally; else null
        ms = sorted(img_mentions, key=lambda m: (m.cap_idx, m.mention_idx))
        for i in range(len(ms)):
            for j in range(i + 1, len(ms)):
                ei, ej = ms[i]._entity, ms[j]._entity  # type: ignore[attr-defined]
                if (cfg.planted and cfg.planted_active_words is not None
                        and ei >= 0 and ej >= 0):
                    # skewed-class rule (see planted_active_words)
                    wi, wj = int(entity_words[ei]), int(entity_words[ej])
                    act = cfg.planted_active_words
                    if wi >= act or wj >= act:
                        lbl = 0
                    elif wi == wj:
                        lbl = 1
                    elif wi < wj:
                        lbl = 2
                    else:
                        lbl = 3
                elif cfg.planted and ei >= 0 and ej >= 0:
                    # word-parity rule (SynthConfig.planted): each class is
                    # a function of the two span head words SEPARATELY
                    # (same-word / even-odd / odd-even / rest), so a model
                    # that learns 8-16 word identities generalizes to
                    # held-out pairs — a successor-style joint rule needs
                    # full pair-space coverage and gates memorization, not
                    # learning (piloted: 0.88 vs 0.98 dev accuracy)
                    wi, wj = int(entity_words[ei]), int(entity_words[ej])
                    if wi == wj:
                        lbl = 1
                    elif wi % 2 == 0 and wj % 2 == 1:
                        lbl = 2
                    elif wi % 2 == 1 and wj % 2 == 0:
                        lbl = 3
                    else:
                        lbl = 0
                elif ei >= 0 and ei == ej:
                    lbl = 1
                elif ei >= 0 and ej >= 0 and (ei, ej) == (0, 1):
                    lbl = 2
                elif ei >= 0 and ej >= 0 and (ei, ej) == (1, 0):
                    lbl = 3
                else:
                    lbl = 0
                pid = make_pair_id(img_id, ms[i].cap_idx, ms[i].mention_idx,
                                   ms[j].cap_idx, ms[j].mention_idx)
                rel_rows.append(_sparse_row(rng, pid, lbl))

        # boxes + affinity grid
        feats = rng.normal(size=(n_boxes, 64)).astype(np.float32)
        for b in range(n_boxes):
            # give each box a signature aligned with its entities' words
            feats[b, :8] += b
            if cfg.planted:
                # an explicit near-one-hot index signature: the planted
                # affinity label (b == word % n_boxes) must be recoverable
                # over the N(0,1) per-instance noise
                feats[b, 8 + b] += 4.0
            box_ids.append(make_box_id(img_id, b))
            box_feats.append(feats[b])
        for m in img_mentions:
            ent = m._entity  # type: ignore[attr-defined]
            for b in range(n_boxes):
                lbl = 1 if (ent >= 0 and int(entity_box[ent]) == b) else 0
                aff_rows.append(_sparse_row(
                    rng, make_affinity_id(img_id, m.cap_idx, m.mention_idx, b), lbl))

    pfx = os.path.join(data_dir, split)
    write_captions(pfx + ".captions.txt", captions)
    write_mentions(pfx + ".mentions.txt", mentions)
    write_feats(pfx + ".nonvisual.feats", nonvis_rows)
    write_feats(pfx + ".cardinality.feats", card_rows)
    write_feats(pfx + ".relation.feats", rel_rows)
    write_feats(pfx + ".affinity.feats", aff_rows)
    write_box_feats(pfx + ".boxes.npz", box_ids, np.stack(box_feats))
    return {
        "captions": len(captions), "mentions": len(mentions),
        "nonvisual": len(nonvis_rows), "relation": len(rel_rows),
        "affinity": len(aff_rows), "boxes": len(box_ids),
        "embeddings": emb_path,
    }


def _sparse_row(rng: np.random.Generator, example_id: str, label: int) -> FeatsExample:
    """Sparse feature vector with unordered 1-indexed features (§6.1)."""
    n = int(rng.integers(2, 8))
    idx = (rng.choice(100, size=n, replace=False) + 1).astype(np.int32)
    val = rng.random(n).astype(np.float32).round(4)
    return FeatsExample(example_id=example_id, label=float(label),
                        indices=idx, values=val)
