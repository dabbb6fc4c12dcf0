"""Kernel-vs-XLA equality for the fused grid head (SURVEY §9.1 step 6).

The Pallas kernel runs in interpreter mode on CPU here; the real-TPU run of
the same equality lives in tests/tpu/ (opt-in).  Also checks the fused
model paths (relation K1 / affinity K2) against their unfused forwards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.ops.grid_head import grid_head_pallas, grid_head_reference


@pytest.mark.parametrize("G,A,B,K,O", [(2, 8, 16, 32, 4), (1, 5, 7, 24, 2),
                                       (3, 9, 130, 16, 2)])
def test_pallas_matches_reference_interpret(G, A, B, K, O):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
    ref = grid_head_reference(X, Y, b1, W2, b2)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        out = grid_head_pallas(X, Y, b1, W2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_relation_fused_matches_unfused(synth_dir, emb):
    from icl.data.imagebatch import RelationBatcher
    from icl.data.pipeline import load_relation_dataset
    from icl.models import RelationModel

    ds = load_relation_dataset(synth_dir, "train", emb)
    b = next(iter(RelationBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    table = jnp.asarray(emb.table)
    kw = dict(lstm_hidden=8, head_hidden=16)
    base = RelationModel(**kw)
    params = base.init(jax.random.PRNGKey(0), table, jb)["params"]
    lo = base.apply({"params": params}, table, jb, deterministic=True)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        lf = RelationModel(**kw, fused=True).apply(
            {"params": params}, table, jb, deterministic=True)
    valid = b.arrays["pair_valid"]
    np.testing.assert_allclose(np.asarray(lf)[valid], np.asarray(lo)[valid],
                               rtol=1e-4, atol=1e-4)


def test_affinity_fused_matches_unfused(synth_dir, emb):
    from icl.data.imagebatch import AffinityBatcher
    from icl.data.pipeline import load_affinity_dataset
    from icl.models import AffinityModel

    ds = load_affinity_dataset(synth_dir, "train", emb)
    b = next(iter(AffinityBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    table = jnp.asarray(emb.table)
    kw = dict(lstm_hidden=8, head_hidden=32)
    base = AffinityModel(**kw)
    params = base.init(jax.random.PRNGKey(0), table, jb)["params"]
    lo = base.apply({"params": params}, table, jb, deterministic=True)
    from jax.experimental.pallas import tpu as pltpu
    with pltpu.force_tpu_interpret_mode():
        lf = AffinityModel(**kw, fused=True).apply(
            {"params": params}, table, jb, deterministic=True)
    valid = b.arrays["grid_valid"]
    np.testing.assert_allclose(np.asarray(lf)[valid], np.asarray(lo)[valid],
                               rtol=1e-4, atol=1e-4)
