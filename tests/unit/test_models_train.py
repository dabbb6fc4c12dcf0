"""Training smoke: loss decreases for all three models (SURVEY §7.4 e2e-tiny)."""

import numpy as np

import jax
import jax.numpy as jnp

from icl.data.imagebatch import AffinityBatcher, RelationBatcher
from icl.data.pipeline import (load_affinity_dataset, load_mention_dataset,
                               load_relation_dataset)
from icl.models import AffinityModel, NonvisualModel, RelationModel
from icl.models.nonvisual import mean_pool_tokens
from icl.train import (create_train_state, make_affinity_train_step,
                       make_mention_train_step, make_relation_train_step)


def test_nonvisual_trains(synth_dir, emb):
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    table = jnp.asarray(emb.table)
    model = NonvisualModel(hidden=32)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids[:2]),
                              jnp.asarray(ds.lengths[:2]))
    st = create_train_state(model, (pooled,), seed=0)
    step = make_mention_train_step()
    args = (jnp.asarray(ds.token_ids), jnp.asarray(ds.lengths),
            jnp.asarray(ds.labels), jnp.ones(len(ds.ids), bool))
    first = None
    for _ in range(25):
        st, m = step(st, table, *args)
        first = first if first is not None else float(m["loss"])
    assert float(m["loss"]) < first


def test_relation_trains(synth_dir, emb):
    ds = load_relation_dataset(synth_dir, "train", emb)
    batches = [{k: jnp.asarray(v) for k, v in b.arrays.items()}
               for b in RelationBatcher(images_per_batch=4).batches(ds)]
    table = jnp.asarray(emb.table)
    model = RelationModel(lstm_hidden=12, head_hidden=24)
    st = create_train_state(model, (table, batches[0]), seed=0)
    step = make_relation_train_step(class_weights=[0.3, 1.0, 1.0, 1.0])
    losses = []
    for _ in range(6):
        for b in batches:
            st, m = step(st, table, b)
            losses.append(float(m["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_affinity_trains(synth_dir, emb):
    ds = load_affinity_dataset(synth_dir, "train", emb)
    batches = [{k: jnp.asarray(v) for k, v in b.arrays.items()}
               for b in AffinityBatcher(images_per_batch=4).batches(ds)]
    table = jnp.asarray(emb.table)
    model = AffinityModel(lstm_hidden=12, head_hidden=32)
    st = create_train_state(model, (table, batches[0]), seed=0)
    step = make_affinity_train_step()
    losses = []
    for _ in range(6):
        for b in batches:
            st, m = step(st, table, b)
            losses.append(float(m["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])


def test_padded_rows_do_not_change_gradients(synth_dir, emb):
    """Bucket padding must be gradient-neutral: a batch with extra invalid
    rows yields the same update as the same batch without them."""
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    table = jnp.asarray(emb.table)
    model = NonvisualModel(hidden=16)
    n = 8
    tok = jnp.asarray(ds.token_ids[:n])
    ln = jnp.asarray(ds.lengths[:n])
    lb = jnp.asarray(ds.labels[:n])
    pooled = mean_pool_tokens(table, tok, ln)
    st0 = create_train_state(model, (pooled,), seed=0)
    step = make_mention_train_step(donate=False)
    # run A: n valid rows only
    stA, _ = step(st0, table, tok, ln, lb, jnp.ones(n, bool))
    # run B: same rows + 4 junk rows marked invalid
    tok_b = jnp.concatenate([tok, tok[:4]])
    ln_b = jnp.concatenate([ln, ln[:4]])
    lb_b = jnp.concatenate([lb, 1 - lb[:4]])
    valid_b = jnp.concatenate([jnp.ones(n, bool), jnp.zeros(4, bool)])
    stB, _ = step(st0, table, tok_b, ln_b, lb_b, valid_b)
    for a, b in zip(jax.tree.leaves(stA.params), jax.tree.leaves(stB.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
