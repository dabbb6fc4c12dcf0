"""Scale posture of the dataset loaders (VERDICT r2 missing#2).

The MSCOCO-scale claim rests on the loaders staying bounded: labels-only
`.feats` reads (no per-row sparse arrays), int-packed per-image pair/cell
buffers, and NO materialized pair-id strings (millions × ~90 bytes at
scale).  These tests pin that posture so a refactor cannot silently regress
to the eager r1/r2 form.
"""

import dataclasses

import numpy as np
import pytest

from icl.data.pipeline import (RelationImage, load_affinity_dataset,
                               load_relation_dataset)


def test_relation_images_store_no_id_strings(synth_dir, emb):
    ds = load_relation_dataset(synth_dir, "train", emb)
    field_names = {f.name for f in dataclasses.fields(RelationImage)}
    # ids are derived (property), never a stored field
    assert "pair_ids" not in field_names
    im = ds.images[0]
    assert im.pair_key.dtype == np.int32 and im.pair_key.shape[1] == 4
    # the property reconstructs the §6.1 ids the .feats file carried
    from icl.io.feats import read_feats_labels
    import os

    file_ids, _ = read_feats_labels(
        os.path.join(synth_dir, "train.relation.feats"))
    derived = [pid for im in ds.images for pid in im.pair_ids]
    assert sorted(derived) == sorted(file_ids)


def test_loaders_never_touch_sparse_columns(synth_dir, emb, monkeypatch):
    """The dataset loaders must use the labels-only read path — parsing the
    idx:val columns for millions of rows is the r2 memory hazard."""
    import icl.io.feats as feats_mod

    def boom(*a, **k):
        raise AssertionError("loader called full read_feats")

    monkeypatch.setattr(feats_mod, "read_feats", boom)
    monkeypatch.setattr(feats_mod, "parse_sparse_line", boom)
    ds = load_relation_dataset(synth_dir, "train", emb)
    assert ds.num_pairs > 0
    ads = load_affinity_dataset(synth_dir, "train", emb)
    assert ads.num_cells > 0
    from icl.data.pipeline import load_mention_dataset

    mds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    assert len(mds.ids) > 0


def test_load_allocation_scales_with_rows(tmp_path, emb):
    """Bounded-memory proxy: loading K relation rows must allocate O(K)
    small-constant bytes (int-packed), not FeatsExample/tuple graphs.

    Measured with tracemalloc on a captions-light synthetic split; the
    bound (400 B/pair) is ~4× the steady int cost (pair_key 16 + pair_ij 8
    + label 4 ≈ 28 B/pair plus transient parse strings) yet ~10× below
    what per-pair FeatsExample objects (+2 numpy arrays each) cost."""
    import tracemalloc

    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path / "scale")
    generate_dataset(d, "train", SynthConfig(
        num_images=60, captions_per_image=4, max_mentions_per_caption=3,
        vocab_size=60, emb_dim=8, seed=1))
    from icl.cli._common import split_vocab
    from icl.data.embeddings import EmbeddingStore
    import os

    emb2 = EmbeddingStore.load(os.path.join(d, "embeddings.txt"))
    tracemalloc.start()
    ds = load_relation_dataset(d, "train", emb2)
    _, peak = tracemalloc.get_traced_memory()
    tracemalloc.stop()
    pairs = ds.num_pairs
    assert pairs > 1500, "fixture too small to be meaningful"
    per_pair = peak / pairs
    assert per_pair < 400, f"{per_pair:.0f} B/pair allocated during load"
