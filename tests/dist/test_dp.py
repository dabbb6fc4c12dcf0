"""Data-parallel correctness on a faked 8-device CPU mesh (SURVEY §7.4).

DP-sharded training must produce (numerically) the same params as
single-device training with the same global batch — XLA's inserted psum is
the only difference.  This is how every mesh/collective path is CI-tested
without a pod (SURVEY §9.3(5)).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.data.imagebatch import RelationBatcher
from icl.data.pipeline import load_mention_dataset, load_relation_dataset
from icl.dist.mesh import build_mesh, data_axis_size, replicate, shard_batch
from icl.models import NonvisualModel, RelationModel
from icl.models.nonvisual import mean_pool_tokens
from icl.train import (create_train_state, make_mention_train_step,
                       make_relation_train_step)


def test_eight_fake_devices_present():
    assert jax.device_count() == 8


def test_mesh_topologies():
    m = build_mesh(None)
    assert data_axis_size(m) == 8
    m2 = build_mesh("4x2")
    assert dict(m2.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        build_mesh("16")


def test_dp_matches_single_device_nonvisual(synth_dir, emb):
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    n = 32  # divisible by 8
    table_h = jnp.asarray(emb.table)
    tok = jnp.asarray(ds.token_ids[:n])
    ln = jnp.asarray(ds.lengths[:n])
    lb = jnp.asarray(ds.labels[:n])
    vd = jnp.ones(n, bool)
    model = NonvisualModel(hidden=16)
    pooled = mean_pool_tokens(table_h, tok[:1], ln[:1])

    def train(mesh):
        st = create_train_state(model, (pooled,), seed=5)
        step = make_mention_train_step(donate=False)
        if mesh is not None:
            st = replicate(st, mesh)
            table = replicate(table_h, mesh)
            args = shard_batch((tok, ln, lb, vd), mesh)
        else:
            table, args = table_h, (tok, ln, lb, vd)
        for _ in range(5):
            st, _ = step(st, table, *args)
        return jax.tree.map(np.asarray, st.params)

    p1 = train(None)
    p8 = train(build_mesh("8"))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, atol=1e-5)


def test_dp_matches_single_device_relation(synth_dir, emb):
    ds = load_relation_dataset(synth_dir, "train", emb)
    batch = next(iter(RelationBatcher(images_per_batch=8).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    table_h = jnp.asarray(emb.table)
    model = RelationModel(lstm_hidden=8, head_hidden=16)

    def train(mesh):
        st = create_train_state(model, (table_h, jb), seed=5)
        step = make_relation_train_step(donate=False)
        if mesh is not None:
            st = replicate(st, mesh)
            table = replicate(table_h, mesh)
            b = shard_batch(jb, mesh)
        else:
            table, b = table_h, jb
        for _ in range(3):
            st, _ = step(st, table, b)
        return jax.tree.map(np.asarray, st.params)

    p1 = train(None)
    p8 = train(build_mesh("8"))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p8)):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_dp_matches_single_device_fused_train(synth_dir, emb):
    """The fused grid-head TRAIN path (custom-VJP pallas kernel) is DP-safe:
    sharded batch + replicated params reproduce the single-device step
    exactly (dropout=0 — the rate>0 kernel path needs the Mosaic PRNG,
    absent in interpret mode; on real chips the per-image seeds make rate>0
    DP-consistent by construction)."""
    import __graft_entry__ as ge
    from icl.models import RelationModel
    from icl.train import create_train_state, make_relation_train_step

    rng = np.random.default_rng(11)
    table_h = jnp.asarray(rng.normal(size=(200, 32)).astype(np.float32))
    batch = ge._synth_relation_batch(rng, I=8, C=2, L=8, M=4, vocab=200)
    model = RelationModel(lstm_hidden=8, head_hidden=16, dropout=0.0,
                          fused=True)
    state = create_train_state(model, (table_h, batch), seed=0)
    step = make_relation_train_step(donate=False)

    st1, m1 = step(state, table_h, batch)
    mesh = build_mesh("8")
    st8, m8 = step(replicate(state, mesh), replicate(table_h, mesh),
                   shard_batch(batch, mesh))
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                               atol=1e-6)
    for a, b in zip(jax.tree.leaves(st1.params), jax.tree.leaves(st8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-6)
