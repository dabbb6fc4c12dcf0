"""2-axis mesh and affinity DP coverage (SURVEY §3.3: model axis plumbed)."""

import numpy as np

import jax
import jax.numpy as jnp

from icl.data.imagebatch import AffinityBatcher
from icl.data.pipeline import load_affinity_dataset
from icl.dist.mesh import build_mesh, replicate, shard_batch
from icl.models import AffinityModel
from icl.train import create_train_state, make_affinity_train_step


def test_training_on_4x2_mesh_matches_single_device(synth_dir, emb):
    """data=4 x model=2 mesh: params replicate over 'model'; results match
    single-device training (the model axis is plumbed but unused)."""
    ds = load_affinity_dataset(synth_dir, "train", emb)
    batch = next(iter(AffinityBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in batch.arrays.items()}
    table_h = jnp.asarray(emb.table)
    model = AffinityModel(lstm_hidden=8, head_hidden=16)

    def train(mesh):
        st = create_train_state(model, (table_h, jb), seed=11)
        step = make_affinity_train_step(donate=False)
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
    p42 = train(build_mesh("4x2"))
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p42)):
        np.testing.assert_allclose(a, b, atol=2e-5)


def test_dedup_shard_sum_replicated_model_axis():
    """P('data') batches are replicated over the model axis: each local row
    block appears m_local times in addressable_shards, and the example
    count must not scale by the model-axis size (r3 review finding)."""
    import numpy as np

    from icl.train.loop import _dedup_shard_sum

    class _Shard:
        def __init__(self, index, data):
            self.index, self.data = index, data

    rows = np.array([True, True, False, True])         # 3 valid of 4
    # 2 data blocks x 2 model replicas on one host (4x2-style mesh)
    shards = [
        _Shard((slice(0, 2),), rows[0:2]), _Shard((slice(0, 2),), rows[0:2]),
        _Shard((slice(2, 4),), rows[2:4]), _Shard((slice(2, 4),), rows[2:4]),
    ]
    assert _dedup_shard_sum(shards, total_size=4) == 3
    # half-covered global array scales by covered fraction, not devices
    assert _dedup_shard_sum(shards[:2], total_size=8) == 2 * (8 // 2)


def test_predict_partition_covers_contiguously(monkeypatch):
    """Union of all processes' [lo, hi) slices is exactly [0, n) in
    process order (the sharded-`.scores` merge concatenates parts in that
    order, so coverage + contiguity is the byte-identity precondition)."""
    import jax

    from icl.dist.mesh import predict_partition

    for p in (1, 2, 3, 8):
        for n in (0, 1, 7, 8, 25):
            monkeypatch.setattr(jax, "process_count", lambda p=p: p)
            cuts = []
            for k in range(p):
                monkeypatch.setattr(jax, "process_index", lambda k=k: k)
                cuts.append(predict_partition(n))
            assert cuts[0][0] == 0 and cuts[-1][1] == n
            for (a, b), (c, d) in zip(cuts, cuts[1:]):
                assert b == c and a <= b and c <= d
            sizes = [hi - lo for lo, hi in cuts]
            assert max(sizes) - min(sizes) <= 1   # balanced


def test_predict_partition_weighted_balances_cost(monkeypatch):
    """With per-example costs (pair/cell counts), boundaries land where
    the cumulative cost crosses k/p of the total: coverage + contiguity
    hold exactly as in the unweighted case, and no host's cost share can
    exceed a fair share by more than one example's weight."""
    import jax
    import numpy as np

    from icl.dist.mesh import predict_partition

    rng = np.random.default_rng(5)
    for p in (1, 2, 3, 8):
        for n in (0, 1, 7, 40):
            w = rng.integers(0, 50, size=n).astype(float)
            monkeypatch.setattr(jax, "process_count", lambda p=p: p)
            cuts = []
            for k in range(p):
                monkeypatch.setattr(jax, "process_index", lambda k=k: k)
                cuts.append(predict_partition(n, weights=w))
            assert cuts[0][0] == 0 and cuts[-1][1] == n
            for (a, b), (c, d) in zip(cuts, cuts[1:]):
                assert b == c and a <= b and c <= d
            if n and w.sum():
                costs = [w[lo:hi].sum() for lo, hi in cuts]
                fair = w.sum() / p
                assert max(costs) <= fair + w.max()
    # a pathological skew the equal-count split gets badly wrong: one
    # heavy example among uniform ones still yields a fair-share+1 split
    w = np.ones(16); w[0] = 100.0
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    lo, hi = predict_partition(16, weights=w)
    assert (lo, hi) == (0, 1)   # the heavy example alone crosses 1/2
