"""DP predict equivalence: mesh-8 scores == single-device scores.

Determinism contract (SURVEY §7.3) must survive sharding: the Java ILP gets
the same bytes whether scoring ran on 1 chip or a pod.
"""

import numpy as np

import jax
import jax.numpy as jnp

from icl.data.imagebatch import RelationBatcher
from icl.data.pipeline import load_relation_dataset
from icl.dist.mesh import build_mesh, replicate, shard_batch
from icl.models import RelationModel
from icl.train.steps import make_relation_predict


def test_predict_probs_identical_across_mesh(synth_dir, emb):
    ds = load_relation_dataset(synth_dir, "train", emb)
    batch = next(iter(RelationBatcher(images_per_batch=8).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    table = jnp.asarray(emb.table)
    model = RelationModel(lstm_hidden=8, head_hidden=16)
    params = model.init(jax.random.PRNGKey(7), table, jb)["params"]
    predict = make_relation_predict(model.apply)

    p1 = np.asarray(predict(params, table, jb))

    mesh = build_mesh("8")
    p8 = np.asarray(predict(replicate(params, mesh),
                            replicate(table, mesh),
                            shard_batch(jb, mesh)))
    valid = batch.arrays["pair_valid"]
    np.testing.assert_allclose(p1[valid], p8[valid], atol=1e-6)
