"""Real-TPU smoke: one jit step per model + kernel-vs-XLA equality on v5e.

Run standalone (NOT via the main suite — tests/conftest.py forces CPU):

    ICL_TPU_TESTS=1 /opt/venv/bin/python3 -m pytest tests/tpu -q -p no:cacheprovider --confcutdir=tests/tpu
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _highest_precision():
    # kernel dots are pinned to HIGHEST (Mosaic rejects HIGH); the XLA
    # reference side must run at the same precision for equality checks
    return jax.default_matmul_precision("highest")


def _require_tpu():
    if jax.devices()[0].platform not in ("tpu",):
        pytest.skip(f"not a TPU platform: {jax.devices()[0].platform}")


def test_grid_head_kernel_on_tpu():
    _require_tpu()
    from icl.ops.grid_head import grid_head_pallas, grid_head_reference
    rng = np.random.default_rng(0)
    G, A, B, K, O = 2, 16, 32, 256, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    with _highest_precision():
        out = np.asarray(grid_head_pallas(X, Y, b1, W2, b2))
        ref = np.asarray(grid_head_reference(X, Y, b1, W2, b2))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_affinity_rank_kernel_on_tpu():
    _require_tpu()
    from icl.ops.affinity_rank import (affinity_rank_pallas,
                                       affinity_rank_reference)
    rng = np.random.default_rng(0)
    G, A, B, K = 2, 16, 24, 256
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(K, 2)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    valid = rng.random((G, B)) < 0.8
    valid[:, 0] = True
    valid = jnp.asarray(valid)
    with _highest_precision():
        out = np.asarray(affinity_rank_pallas(X, Y, b1, W2, b2, valid))
        ref = np.asarray(affinity_rank_reference(X, Y, b1, W2, b2, valid))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_bilstm_kernel_on_tpu():
    _require_tpu()
    from icl.models.rnn import BiLSTM
    from icl.ops.lstm_kernel import bilstm_apply_pallas
    import jax as _jax
    rng = np.random.default_rng(3)
    B, L, D, H = 64, 12, 20, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=B).astype(np.int32))
    m = BiLSTM(hidden=H)
    params = m.init(_jax.random.PRNGKey(0), x, lengths)["params"]
    with _highest_precision():
        seq_ref, fin_ref = m.apply({"params": params}, x, lengths)
        seq_k, fin_k = bilstm_apply_pallas(x, lengths, params, hidden=H)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref),
                               rtol=1e-4, atol=1e-5)


def test_one_train_step_per_model_on_tpu(tmp_path):
    _require_tpu()
    from icl.testing.synth import SynthConfig, generate_dataset
    from icl.data.embeddings import EmbeddingStore
    from icl.data.imagebatch import AffinityBatcher, RelationBatcher
    from icl.data.pipeline import (load_affinity_dataset,
                                   load_mention_dataset,
                                   load_relation_dataset)
    from icl.models import AffinityModel, NonvisualModel, RelationModel
    from icl.models.nonvisual import mean_pool_tokens
    from icl.train import (create_train_state, make_affinity_train_step,
                           make_mention_train_step, make_relation_train_step)

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=1))
    emb = EmbeddingStore.load(d + "/embeddings.txt")
    table = jnp.asarray(emb.table)

    ds = load_mention_dataset(d, "train", "nonvisual", emb)
    model = NonvisualModel(hidden=32)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids[:1]),
                              jnp.asarray(ds.lengths[:1]))
    st = create_train_state(model, (pooled,), seed=0)
    st, m = make_mention_train_step()(st, table, jnp.asarray(ds.token_ids),
                                      jnp.asarray(ds.lengths),
                                      jnp.asarray(ds.labels),
                                      jnp.ones(len(ds.ids), bool))
    assert np.isfinite(float(m["loss"]))

    rds = load_relation_dataset(d, "train", emb)
    rb = next(iter(RelationBatcher(images_per_batch=4).batches(rds)))
    jb = {k: jnp.asarray(v) for k, v in rb.arrays.items()}
    rmodel = RelationModel(lstm_hidden=16, head_hidden=32)
    rst = create_train_state(rmodel, (table, jb), seed=0)
    rst, m = make_relation_train_step()(rst, table, jb)
    assert np.isfinite(float(m["loss"]))

    ads = load_affinity_dataset(d, "train", emb)
    ab = next(iter(AffinityBatcher(images_per_batch=4).batches(ads)))
    jab = {k: jnp.asarray(v) for k, v in ab.arrays.items()}
    amodel = AffinityModel(lstm_hidden=16, head_hidden=64)
    ast = create_train_state(amodel, (table, jab), seed=0)
    ast, m = make_affinity_train_step()(ast, table, jab)
    assert np.isfinite(float(m["loss"]))
