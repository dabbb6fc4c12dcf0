"""Overflow beyond the largest bucket must not drop data (batcher contract)."""

import numpy as np

from icl.data.buckets import BucketSpec
from icl.data.imagebatch import RelationBatcher
from icl.data.pipeline import RelationDataset, RelationImage


def _image_with_m(m: int, img_id: str) -> RelationImage:
    L, C = 6, 2
    tokens = np.ones((C, L), np.int32)
    tok_len = np.full(C, L, np.int32)
    m_cap = (np.arange(m) % C).astype(np.int32)
    m_first = np.zeros(m, np.int32)
    m_last = np.ones(m, np.int32)
    iu, ju = np.triu_indices(m, k=1)
    pair_ij = np.stack([iu, ju], 1).astype(np.int32)
    return RelationImage(
        img_id=img_id, tokens=tokens, tok_len=tok_len, m_cap=m_cap,
        m_first=m_first, m_last=m_last, pair_ij=pair_ij,
        pair_label=np.zeros(len(iu), np.int32),
        pair_key=np.stack([np.zeros_like(iu), iu,
                           np.zeros_like(ju), ju], 1).astype(np.int32))


def test_bucket_of_overflow_rounds_up():
    spec = BucketSpec((8, 16, 32))
    assert spec.bucket_of(33) == 40
    assert spec.bucket_of(50) == 56
    assert spec.bucket_of(33, strict=True) == 32


def test_relation_batcher_keeps_oversized_images():
    # 40 mentions > largest mention bucket (32): no pair may be dropped
    ds = RelationDataset(images=[_image_with_m(40, "big.jpg"),
                                 _image_with_m(4, "small.jpg")])
    batcher = RelationBatcher(images_per_batch=2)
    seen = []
    for b in batcher.batches(ds):
        seen.extend(pid for _, _, pid in b.id_index)
    want = [pid for im in ds.images for pid in im.pair_ids]
    assert sorted(seen) == sorted(want)


def test_ordered_pair_export_never_truncated():
    """An image with more than M(M-1)/2 pair rows (ordered/both-direction
    .feats export) gets a doubled pair capacity in the bucket key instead
    of silently dropping labels and .scores ids (r3 review finding)."""
    import numpy as np

    from icl.data.imagebatch import RelationBatcher
    from icl.data.pipeline import RelationDataset, RelationImage

    M_real = 4
    # all ordered pairs (i != j): 12 > 4*3/2 = 6
    pairs = [(i, j) for i in range(M_real) for j in range(M_real) if i != j]
    im = RelationImage(
        img_id="x.jpg",
        tokens=np.ones((1, 6), np.int32),
        tok_len=np.full((1,), 6, np.int32),
        m_cap=np.zeros(M_real, np.int32),
        m_first=np.arange(M_real, dtype=np.int32),
        m_last=np.arange(M_real, dtype=np.int32),
        pair_ij=np.array(pairs, np.int32),
        pair_label=np.arange(len(pairs), dtype=np.int32) % 4,
        pair_key=np.array([(0, i, 0, j) for i, j in pairs], np.int32),
    )
    b = RelationBatcher(images_per_batch=1, with_ids=True)
    (batch,) = list(b.batches(RelationDataset(images=[im])))
    L, M, P, C = batch.shape_key
    assert P >= len(pairs)
    assert int(batch.arrays["pair_valid"].sum()) == len(pairs)
    assert len(batch.id_index) == len(pairs)       # every id survives
    # labels land unshuffled in file order
    np.testing.assert_array_equal(
        batch.arrays["pair_label"][0, :len(pairs)], im.pair_label)


def test_overflow_bucket_pads_past_dataset_width():
    """An outlier length whose bucket rounds past the dataset's padded
    width must be padded out, not crash the crop (r3 review)."""
    import numpy as np

    from icl.data.buckets import Bucketizer, BucketSpec

    bz = Bucketizer(BucketSpec((8, 16)), batch_size=2)
    lengths = np.array([41, 5])
    arrays = {"tok": np.ones((2, 41), np.int32)}
    got = list(bz.batches(lengths, arrays, ids=["a", "b"],
                          pad_axis_keys={"tok": 1}))
    by_len = {bl: b for bl, b in got}
    assert 48 in by_len                      # 41 → next multiple of 8
    assert by_len[48].arrays["tok"].shape == (2, 48)
    assert (by_len[48].arrays["tok"][:, 41:] == 0).all()   # zero-padded
    assert by_len[8].arrays["tok"].shape == (2, 8)


def test_bucketizer_rejects_length_id_mismatch():
    import numpy as np
    import pytest

    from icl.data.buckets import Bucketizer, BucketSpec

    bz = Bucketizer(BucketSpec((8,)), batch_size=2)
    with pytest.raises(ValueError, match="disagree"):
        list(bz.batches(np.array([3, 4, 5]), {"x": np.ones((3, 8))},
                        ids=["a", "b"]))
