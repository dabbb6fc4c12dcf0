"""Compile-count guard (SURVEY §9.3 item 2).

Variable caption lengths / mention counts must not cause a recompile storm:
the number of traced shapes for a jitted predict is bounded by the bucket
inventory, not the number of distinct raw example shapes.
"""

import numpy as np

import jax
import jax.numpy as jnp

from icl.data.imagebatch import RelationBatcher
from icl.data.pipeline import RelationDataset, RelationImage
from icl.models import RelationModel
from icl.train.steps import make_relation_predict


def _image(img_id, n_caps, cap_len, n_mentions):
    tokens = np.ones((n_caps, cap_len), np.int32)
    tok_len = np.full(n_caps, cap_len, np.int32)
    m_cap = (np.arange(n_mentions) % n_caps).astype(np.int32)
    m_first = np.zeros(n_mentions, np.int32)
    m_last = np.minimum(1, cap_len - 1) * np.ones(n_mentions, np.int32)
    iu, ju = np.triu_indices(n_mentions, k=1)
    return RelationImage(
        img_id=img_id, tokens=tokens, tok_len=tok_len, m_cap=m_cap,
        m_first=m_first, m_last=m_last,
        pair_ij=np.stack([iu, ju], 1).astype(np.int32),
        pair_label=np.zeros(len(iu), np.int32),
        pair_key=np.stack([np.zeros_like(iu), iu,
                           np.zeros_like(ju), ju], 1).astype(np.int32))


def test_bounded_compiles_across_varied_shapes():
    # 30 images with 15 distinct raw (len, mentions) shapes
    rng = np.random.default_rng(0)
    images = [_image(f"i{k}.jpg", n_caps=5,
                     cap_len=int(rng.integers(3, 40)),
                     n_mentions=int(rng.integers(2, 20)))
              for k in range(30)]
    ds = RelationDataset(images=images)
    batcher = RelationBatcher(images_per_batch=4)
    model = RelationModel(lstm_hidden=4, head_hidden=8)
    table = jnp.asarray(rng.normal(size=(10, 6)).astype(np.float32))
    batches = list(batcher.batches(ds))
    b0 = {k: jnp.asarray(v) for k, v in batches[0].arrays.items()}
    params = model.init(jax.random.PRNGKey(0), table, b0)["params"]
    predict = make_relation_predict(model.apply)
    shape_keys = set()
    for b in batches:
        jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
        predict(params, table, jb)
        shape_keys.add(b.shape_key)
    # bucket inventory bounds both the shape-key set and actual compiles
    max_buckets = 3 * 3  # |len buckets| x |mention buckets| (no overflow here)
    assert len(shape_keys) <= max_buckets
    assert predict._cache_size() == len(shape_keys)
