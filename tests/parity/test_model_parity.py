"""Full-model score parity vs the Keras-3 CPU oracle (SURVEY §7.3).

Gate: max |p_jax − p_oracle| ≤ 1e-5 fp32 for all three task models on the
synthetic fixture set, with identical weights.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.data.imagebatch import AffinityBatcher, RelationBatcher
from icl.data.pipeline import (load_affinity_dataset, load_mention_dataset,
                               load_relation_dataset)
from icl.models import AffinityModel, NonvisualModel, RelationModel
from icl.models.nonvisual import mean_pool_tokens

GATE = 1e-5


def _np_params(params):
    return jax.tree.map(np.asarray, params)


def test_nonvisual_parity(synth_dir, emb):
    from icl.eval.oracle import oracle_ffnn
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    table = jnp.asarray(emb.table)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids),
                              jnp.asarray(ds.lengths))
    model = NonvisualModel(hidden=24)
    params = model.init(jax.random.PRNGKey(1), pooled)["params"]
    p_jax = np.asarray(model.apply({"params": params}, pooled,
                                   deterministic=True))
    p_jax = np.exp(p_jax - p_jax.max(-1, keepdims=True))
    p_jax /= p_jax.sum(-1, keepdims=True)
    p_oracle = oracle_ffnn(_np_params(params), np.asarray(pooled))
    assert np.abs(p_jax - p_oracle).max() < GATE


def test_cardinality_parity(synth_dir, emb):
    """C9 oracle gate (VERDICT r1 missing#6): same FFNN oracle as nonvisual
    but with the 12-way head, so the one task without a gate gets one."""
    from icl.eval.oracle import oracle_ffnn
    from icl.models.cardinality import CardinalityModel
    ds = load_mention_dataset(synth_dir, "train", "cardinality", emb)
    table = jnp.asarray(emb.table)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids),
                              jnp.asarray(ds.lengths))
    model = CardinalityModel(hidden=24)
    params = model.init(jax.random.PRNGKey(4), pooled)["params"]
    p_jax = np.asarray(jax.nn.softmax(
        model.apply({"params": params}, pooled, deterministic=True), axis=-1))
    p_oracle = oracle_ffnn(_np_params(params), np.asarray(pooled))
    assert p_jax.shape[-1] == 12
    assert np.abs(p_jax - p_oracle).max() < GATE


def test_relation_parity(synth_dir, emb):
    from icl.eval.oracle import oracle_relation
    ds = load_relation_dataset(synth_dir, "train", emb)
    batch = next(iter(RelationBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    table = jnp.asarray(emb.table)
    model = RelationModel(lstm_hidden=10, head_hidden=16)
    params = model.init(jax.random.PRNGKey(2), table, jb)["params"]
    logits = model.apply({"params": params}, table, jb, deterministic=True)
    p_jax = np.asarray(jax.nn.softmax(logits, axis=-1))
    p_oracle = oracle_relation(_np_params(params), emb.table, batch.arrays)
    valid = batch.arrays["pair_valid"]
    assert np.abs(p_jax[valid] - p_oracle[valid]).max() < GATE


@pytest.mark.parametrize("phrase_enc", ["lstm", "mean_w2v"])
def test_affinity_parity(synth_dir, emb, phrase_enc):
    from icl.eval.oracle import oracle_affinity
    ds = load_affinity_dataset(synth_dir, "train", emb)
    batch = next(iter(AffinityBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    table = jnp.asarray(emb.table)
    model = AffinityModel(lstm_hidden=10, head_hidden=32, phrase_enc=phrase_enc)
    params = model.init(jax.random.PRNGKey(3), table, jb)["params"]
    logits = model.apply({"params": params}, table, jb, deterministic=True)
    p_jax = np.asarray(jax.nn.softmax(logits, axis=-1))
    p_oracle = oracle_affinity(_np_params(params), emb.table, batch.arrays,
                               phrase_enc=phrase_enc)
    valid = batch.arrays["grid_valid"]
    assert np.abs(p_jax[valid] - p_oracle[valid]).max() < GATE
