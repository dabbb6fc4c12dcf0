"""Unit tests: embeddings, bucketing invariants, dataset assembly (SURVEY §7.2)."""

import os

import numpy as np

from icl.data.buckets import Bucketizer, BucketSpec
from icl.data.embeddings import EmbeddingStore
from icl.data.imagebatch import AffinityBatcher, RelationBatcher
from icl.data.pairs import enumerate_pairs
from icl.data.pipeline import (load_affinity_dataset, load_mention_dataset,
                               load_relation_dataset)
from icl.io.captions import Mention


def test_embedding_text_binary_roundtrip(tmp_path, emb):
    p = str(tmp_path / "emb.bin")
    emb.save_binary(p)
    emb2 = EmbeddingStore.load(p)
    assert emb2.vocab == emb.vocab
    np.testing.assert_allclose(emb2.table, emb.table, rtol=1e-6)


def test_embedding_oov_and_pool(emb):
    assert emb.lookup_id("___nope___") == 0
    np.testing.assert_array_equal(emb.table[0], 0.0)
    v = emb.mean_pool(["w001", "___nope___"])
    np.testing.assert_allclose(v, emb.table[emb.vocab["w001"]] / 2, rtol=1e-6)
    ids, n = emb.encode_tokens(["w001", "w002"], 5)
    assert n == 2 and ids[2:].tolist() == [0, 0, 0]


def test_bucket_spec():
    spec = BucketSpec((8, 16, 32))
    assert spec.bucket_of(1) == 8 and spec.bucket_of(8) == 8
    assert spec.bucket_of(9) == 16
    assert spec.bucket_of(99) == 104                 # overflow rounds up
    assert spec.bucket_of(99, strict=True) == 32     # strict clamps


def test_bucketizer_no_drop_and_masking():
    n = 37
    lengths = np.random.default_rng(0).integers(1, 20, n)
    arrays = {"x": np.arange(n * 24, dtype=np.float32).reshape(n, 24)}
    ids = [f"id{i}" for i in range(n)]
    bz = Bucketizer(BucketSpec((8, 16, 24)), batch_size=8)
    seen = []
    shapes = set()
    for blen, batch in bz.batches(lengths, arrays, ids,
                                  pad_axis_keys={"x": 1}):
        assert batch.size == 8  # fixed batch shape
        assert batch.arrays["x"].shape == (8, blen)
        shapes.add(batch.arrays["x"].shape)
        seen.extend(batch.ids)
        assert batch.num_valid == len(batch.ids)
    assert sorted(seen) == sorted(ids)  # nothing dropped, nothing duplicated
    assert len(shapes) <= 3  # bounded compile inventory


def test_pair_enumeration():
    ms = [Mention("a.jpg", 1, 0, 0, 0), Mention("a.jpg", 0, 0, 0, 0),
          Mention("a.jpg", 0, 1, 1, 1)]
    pairs, ids = enumerate_pairs(ms)
    assert pairs.shape == (3, 2)
    # sorted by (caption, mention): (0,0),(0,1),(1,0)
    assert ids[0] == "doc:a.jpg;caption_1:0;mention_1:0;caption_2:0;mention_2:1"
    assert ids[-1] == "doc:a.jpg;caption_1:0;mention_1:1;caption_2:1;mention_2:0"


def test_mention_dataset(synth_dir, emb):
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    assert ds.token_ids.shape[0] == len(ds.ids) == len(ds.labels)
    assert set(np.unique(ds.labels)) <= {0, 1}
    assert (ds.lengths >= 1).all()


def test_relation_dataset_and_batcher(synth_dir, emb):
    ds = load_relation_dataset(synth_dir, "train", emb)
    assert ds.images and ds.num_pairs > 0
    for im in ds.images:
        m = len(im.m_cap)
        assert im.pair_ij.shape[0] == m * (m - 1) // 2
        assert (im.m_last >= im.m_first).all()
        assert (im.m_last < im.tok_len[im.m_cap]).all()
    batcher = RelationBatcher(images_per_batch=4)
    ids_seen = []
    for batch in batcher.batches(ds):
        a = batch.arrays
        I, C, L = a["tokens"].shape
        assert a["pair_ij"].max() < a["m_valid"].shape[1]
        # padded caption positions are PAD=0
        for s in range(I):
            for c in range(C):
                assert (a["tokens"][s, c, a["tok_len"][s, c]:] == 0).all()
        ids_seen.extend(pid for _, _, pid in batch.id_index)
    all_ids = [pid for im in ds.images for pid in im.pair_ids]
    assert sorted(ids_seen) == sorted(all_ids)


def test_affinity_dataset_and_batcher(synth_dir, emb):
    ds = load_affinity_dataset(synth_dir, "train", emb)
    assert ds.images and ds.num_cells > 0
    batcher = AffinityBatcher(images_per_batch=4)
    cells = 0
    for batch in batcher.batches(ds):
        a = batch.arrays
        assert a["grid_valid"].shape == a["grid_label"].shape
        assert not a["grid_valid"][~a["img_valid"]].any()
        cells += len(batch.id_index)
    assert cells == ds.num_cells


def test_embedding_restrict_and_binary_filter(tmp_path, emb):
    import os
    p = str(tmp_path / "emb2.bin")
    emb.save_binary(p)
    some = sorted(emb.vocab)[:5]
    sub = EmbeddingStore.load(p, restrict_to=set(some) | {"not_a_word"})
    assert sorted(sub.vocab) == sorted(some)
    for w in some:
        np.testing.assert_allclose(sub.table[sub.vocab[w]],
                                   emb.table[emb.vocab[w]], rtol=1e-6)
    # pure-python restrict path agrees
    sub2 = emb.restrict(set(some))
    assert sub2.vocab.keys() == sub.vocab.keys()


def test_batcher_train_mode_skips_predict_bookkeeping(synth_dir, emb):
    """with_ids=False / build_grid gating: train batches carry no id_index
    (pure-Python cost) and predict batches no grid arrays — the array
    payloads that ARE built stay identical either way."""
    from icl.data.imagebatch import AffinityBatcher, RelationBatcher
    from icl.data.pipeline import load_affinity_dataset, load_relation_dataset

    rds = load_relation_dataset(synth_dir, "train", emb)
    full = next(iter(RelationBatcher(images_per_batch=4).batches(rds)))
    lean = next(iter(RelationBatcher(images_per_batch=4, build_grid=False,
                                     with_ids=False).batches(rds)))
    assert full.id_index and not lean.id_index
    assert "grid_label" in full.arrays and "grid_label" not in lean.arrays
    for k, v in lean.arrays.items():
        np.testing.assert_array_equal(v, full.arrays[k])

    ads = load_affinity_dataset(synth_dir, "train", emb)
    afull = next(iter(AffinityBatcher(images_per_batch=4).batches(ads)))
    alean = next(iter(AffinityBatcher(images_per_batch=4,
                                      with_ids=False).batches(ads)))
    assert afull.id_index and not alean.id_index
    for k, v in alean.arrays.items():
        np.testing.assert_array_equal(v, afull.arrays[k])


def test_prefetch_threaded_order_and_errors():
    """Threaded prefetch preserves order, drains fully, and re-raises
    generator exceptions at the consumer."""
    import time

    from icl.train.loop import prefetch

    def slow_gen(n):
        for i in range(n):
            time.sleep(0.001)
            yield i

    assert list(prefetch(slow_gen(17), depth=2)) == list(range(17))
    assert list(prefetch(iter([]), depth=2)) == []

    def bad_gen():
        yield 0
        raise RuntimeError("boom")

    it = prefetch(bad_gen(), depth=2)
    assert next(it) == 0
    try:
        next(it)
        raise AssertionError("expected RuntimeError")
    except RuntimeError as e:
        assert "boom" in str(e)


def test_prefetch_abandoned_consumer_stops_worker():
    """Closing the prefetch generator early (consumer raised) releases the
    worker thread instead of leaving it blocked on a full queue."""
    import threading
    import time

    from icl.train.loop import prefetch

    def endless():
        i = 0
        while True:
            yield i
            i += 1

    it = prefetch(endless(), depth=2)
    assert next(it) == 0
    before = sum(1 for t in threading.enumerate()
                 if t.name == "icl-batch-prefetch")
    assert before >= 1
    it.close()                      # abandon: GeneratorExit → stop event
    deadline = time.time() + 5
    while time.time() < deadline:
        if not any(t.name == "icl-batch-prefetch" and t.is_alive()
                   for t in threading.enumerate()):
            break
        time.sleep(0.05)
    assert not any(t.name == "icl-batch-prefetch" and t.is_alive()
                   for t in threading.enumerate())


def test_pad_cache_holds_two_batcher_specs(synth_dir, emb):
    """Two batchers with different bucket specs over ONE dataset (train +
    a differently-bucketed eval config) must both hit the per-image pad
    cache after warm-up instead of thrashing a single entry
    (VERDICT r2 weak#7)."""
    ds = load_relation_dataset(synth_dir, "train", emb)
    b1 = RelationBatcher(images_per_batch=4)
    b2 = RelationBatcher(images_per_batch=4,
                         len_spec=BucketSpec((8, 64)),
                         mention_spec=BucketSpec((4, 32)))
    for b in (b1, b2):                       # warm both cache entries
        for _ in b.batches(ds):
            pass
    im = ds.images[0]
    keys = list(im._pad_cache)
    assert len(keys) == 2 and keys[0] != keys[1]
    # alternating re-runs must be pure cache hits: identical object identity
    f1 = b1._image_fields(im, keys[0])
    f2 = b2._image_fields(im, keys[1])
    assert b1._image_fields(im, keys[0]) is f1
    assert b2._image_fields(im, keys[1]) is f2
    # and the arrays agree with a cold rebuild
    im2 = ds.images[0]
    im2._pad_cache.clear()
    cold = b2._image_fields(im2, keys[1])
    for name, arr in f2.items():
        np.testing.assert_array_equal(arr, cold[name])


def test_utf8_text_embeddings_not_misdetected_as_binary(tmp_path):
    """A text w2v file with a 'V D' header and non-ASCII words must load
    as TEXT — the old any(b>127) probe reinterpreted it as raw float32
    and silently produced a garbage table (r3 review finding)."""
    import numpy as np

    from icl.data.embeddings import EmbeddingStore

    p = str(tmp_path / "emb.txt")
    with open(p, "w", encoding="utf-8") as f:
        f.write("2 3\nüber 0.1 0.2 0.3\nfoo 1 2 3\n")
    e = EmbeddingStore.load(p)
    assert set(e.vocab) == {"über", "foo"}
    np.testing.assert_allclose(e.table[e.vocab["über"]], [0.1, 0.2, 0.3],
                               rtol=1e-6)


def test_binary_fallback_streams_and_restricts(tmp_path):
    """Pure-Python .bin fallback parses record-by-record (bounded window)
    and honors restrict_to; truncated files keep the parsed prefix."""
    import numpy as np

    from icl.data.embeddings import EmbeddingStore

    src = EmbeddingStore.from_arrays(
        ["Alpha", "beta", "Gamma"],
        np.arange(9, dtype=np.float32).reshape(3, 3))
    p = str(tmp_path / "emb.bin")
    src.save_binary(p)
    full = EmbeddingStore._load_binary(p)
    assert sorted(full.vocab) == ["Alpha", "Gamma", "beta"]
    np.testing.assert_allclose(full.table[full.vocab["beta"]],
                               src.table[src.vocab["beta"]])
    only = EmbeddingStore._load_binary(p, restrict_to={"beta"})
    assert set(only.vocab) == {"beta"}
    # truncate mid-vector: loader keeps what parsed instead of raising
    raw = open(p, "rb").read()
    open(str(tmp_path / "trunc.bin"), "wb").write(raw[:len(raw) - 6])
    part = EmbeddingStore._load_binary(str(tmp_path / "trunc.bin"))
    assert sorted(part.vocab) == ["Alpha", "beta"]


def test_restrict_keeps_lowercase_fallback_forms():
    """restrict() expands to lowercase forms exactly like
    load(restrict_to=...), so the lookup_id OOV fallback survives
    restriction on both construction paths (r3 review finding)."""
    import numpy as np

    from icl.data.embeddings import EmbeddingStore

    src = EmbeddingStore.from_arrays(["Dog", "dog", "cat"],
                                     np.ones((3, 2), np.float32))
    sub = src.restrict({"Dog"})
    assert set(sub.vocab) == {"Dog", "dog"}
    assert sub.lookup_id("Dog") == sub.vocab["Dog"]


def test_affinity_duplicate_box_id_last_wins(tmp_path):
    """A duplicated box id in boxes.npz must resolve affinity cells to the
    LAST file-order occurrence's grid column — the {box: col} dict the
    vectorized searchsorted resolution replaced was last-wins (ADVICE r3)."""
    from icl.testing.synth import SynthConfig, generate_dataset

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=2, seed=3))
    emb_ = EmbeddingStore.load(os.path.join(d, "embeddings.txt"))
    base = load_affinity_dataset(d, "train", emb_)
    img0 = base.images[0]

    # duplicate image-0's box 0 with RECOGNIZABLY different features
    npz = os.path.join(d, "train.boxes.npz")
    with np.load(npz) as z:
        ids = [str(s) for s in z["ids"]]
        feats = np.asarray(z["feats"], np.float32)
    from icl.io.boxes import make_box_id, write_box_feats

    dup_id = make_box_id(img0.img_id, img0.box_idx[0])
    dup_row = np.full((1, feats.shape[1]), 123.0, np.float32)
    write_box_feats(npz, ids + [dup_id], np.vstack([feats, dup_row]))

    ds = load_affinity_dataset(d, "train", emb_)
    im = next(i for i in ds.images if i.img_id == img0.img_id)
    # grid grew by one column; the duplicated index appears twice, sorted
    assert len(im.box_idx) == len(img0.box_idx) + 1
    cols = [c for c, b in enumerate(im.box_idx) if b == img0.box_idx[0]]
    assert len(cols) == 2
    first_col, last_col = cols
    # file order within the equal run: original row first, appended last
    np.testing.assert_array_equal(np.asarray(im.box_feats)[last_col],
                                  dup_row[0])
    # cells for the duplicated box land on the LAST column only
    np.testing.assert_array_equal(im.grid_valid[:, first_col], False)
    np.testing.assert_array_equal(im.grid_valid[:, last_col],
                                  img0.grid_valid[:, 0])
    np.testing.assert_array_equal(im.grid_label[:, last_col],
                                  img0.grid_label[:, 0])
