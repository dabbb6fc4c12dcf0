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
    losses = []
    for _ in range(25):
        st, m = step(st, table, *args)
        losses.append(float(m["loss"]))
    # dropout makes single-step losses bouncy: require a clear downward
    # TREND (tail mean vs head mean), not last < first (observed flaking
    # on marginal runs under full-suite scheduling)
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) - 0.01, losses


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


def test_grid_loss_step_matches_pair_step(synth_dir, emb):
    """The grid-loss train step (in-kernel CE on TPU; grid_ce_sums oracle
    here) reproduces the pair-form step: same loss, acc, and parameter
    updates — via the host-built grid arrays AND the scatter fallback
    (which must agree bitwise with each other)."""
    ds = load_relation_dataset(synth_dir, "train", emb)
    b = next(iter(RelationBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    assert "grid_label" in jb and "grid_valid" in jb
    table = jnp.asarray(emb.table)
    for fused in (False, True):
        model = RelationModel(lstm_hidden=12, head_hidden=24, dropout=0.0,
                              fused=fused)
        st = create_train_state(model, (table, jb), seed=0)
        cw = [0.3, 1.0, 1.0, 1.0]
        s_pair = make_relation_train_step(class_weights=cw, donate=False)
        s_grid = make_relation_train_step(class_weights=cw, donate=False,
                                          grid_loss=True)
        st1, m1 = s_pair(st, table, jb)
        st2, m2 = s_grid(st, table, jb)                    # host-built grid
        nb = {k: v for k, v in jb.items()
              if k not in ("grid_label", "grid_valid")}
        st3, m3 = s_grid(st, table, nb)                    # scatter fallback
        # pair-form and grid-form sum the same cells in different orders:
        # ~1e-6 relative drift is legitimate f32 reassociation
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["acc"]), float(m2["acc"]),
                                   rtol=1e-6)
        for a, b2, c in zip(jax.tree.leaves(st1.params),
                            jax.tree.leaves(st2.params),
                            jax.tree.leaves(st3.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=3e-5)
            np.testing.assert_array_equal(np.asarray(b2), np.asarray(c))


def test_affinity_grid_loss_step_matches(synth_dir, emb):
    """Affinity grid-loss step ≡ the masked_weighted_ce step (labels are
    already grid-shaped — no scatter involved)."""
    ds = load_affinity_dataset(synth_dir, "train", emb)
    b = next(iter(AffinityBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    table = jnp.asarray(emb.table)
    for fused in (False, True):
        model = AffinityModel(lstm_hidden=12, head_hidden=32, dropout=0.0,
                              fused=fused)
        st = create_train_state(model, (table, jb), seed=0)
        s0 = make_affinity_train_step(donate=False)
        s1 = make_affinity_train_step(donate=False, grid_loss=True)
        st1, m1 = s0(st, table, jb)
        st2, m2 = s1(st, table, jb)
        np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                                   rtol=1e-5)
        np.testing.assert_allclose(float(m1["acc"]), float(m2["acc"]),
                                   rtol=1e-6)
        for a, b2 in zip(jax.tree.leaves(st1.params),
                         jax.tree.leaves(st2.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b2),
                                       atol=3e-5)


def test_grid_loss_eval_mode(synth_dir, emb):
    """loss_grid with deterministic=True (the eval-loss capability): both
    fused and gather models return the same (Σ ce·w, Σ hits, Σ valid) as
    grid_ce_sums over the deterministic logits grid."""
    from icl.ops.grid_head_train import grid_ce_sums
    from icl.train.steps import _cell_weights

    ds = load_relation_dataset(synth_dir, "train", emb)
    b = next(iter(RelationBatcher(images_per_batch=4).batches(ds)))
    jb = {k: jnp.asarray(v) for k, v in b.arrays.items()}
    table = jnp.asarray(emb.table)
    cw = jnp.asarray([0.3, 1.0, 1.0, 1.0])
    weights = _cell_weights(jb["grid_label"], jb["grid_valid"], cw)
    ref = None
    for fused in (False, True):
        model = RelationModel(lstm_hidden=12, head_hidden=24, dropout=0.5,
                              fused=fused)
        st = create_train_state(model, (table, jb), seed=0)
        out = model.apply({"params": st.params}, table, jb,
                          deterministic=True,
                          loss_grid=(jb["grid_label"], weights))
        assert len(out) == 3 and all(np.isfinite(float(v)) for v in out)
        if ref is None:
            ref = out
        else:
            for name, a, c in zip(["loss_sum", "hits", "nvalid"], out, ref):
                np.testing.assert_allclose(float(a), float(c), rtol=1e-5,
                                           err_msg=name)


def test_host_cell_weights_bitwise_matches_device():
    """The multi-host eval hook computes its GLOBAL weight normalizer on
    host (icl.train.evalhook._host_cell_weights) while the device pass
    uses icl.train.steps._cell_weights — the lockstep early-stop contract
    rests on the two being bitwise-identical float32, including labels
    outside [0, K) (weight 0 both sides)."""
    import numpy as np

    from icl.train.evalhook import _host_cell_weights
    from icl.train.steps import _cell_weights

    rng = np.random.default_rng(11)
    labels = rng.integers(-1, 6, size=(7, 13)).astype(np.int32)  # incl. -1/5
    valid = rng.random((7, 13)) < 0.8
    cw = np.array([0.3, 1.0, 2.5, 0.7, 1.9], np.float32)
    import jax.numpy as jnp

    dev = np.asarray(_cell_weights(jnp.asarray(labels), jnp.asarray(valid),
                                   jnp.asarray(cw)))
    host = _host_cell_weights(labels, valid, cw)
    np.testing.assert_array_equal(dev, host)
    # and the no-class-weights path
    np.testing.assert_array_equal(
        np.asarray(_cell_weights(jnp.asarray(labels), jnp.asarray(valid),
                                 None)),
        _host_cell_weights(labels, valid, None))
