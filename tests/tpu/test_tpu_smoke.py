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
    # shape 1: flat fast path at TG=2; shape 2: tiled kernel (>4 MB
    # activation gate); shape 3: flat at TG=8 (the production batch case)
    for G, A, B, K, O in [(2, 16, 32, 256, 4), (2, 40, 136, 256, 4),
                          (16, 16, 16, 800, 4)]:
        X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
        Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
        W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
        with _highest_precision():
            out = np.asarray(grid_head_pallas(X, Y, b1, W2, b2))
            ref = np.asarray(grid_head_reference(X, Y, b1, W2, b2))
        np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4,
                                   err_msg=f"{(G, A, B, K, O)}")


def test_grid_head_fast_dot_on_tpu():
    """bf16-throughput-mode kernel dot (fast_dot=True): one-pass bf16 MXU
    against the f32 oracle within bf16 product tolerance, on both the flat
    and tiled kernel paths.  f32 mode (fast_dot=False) is untouched and
    keeps its own 1e-4 gate in test_grid_head_kernel_on_tpu."""
    _require_tpu()
    from icl.ops.grid_head import grid_head_pallas, grid_head_reference
    rng = np.random.default_rng(3)
    for G, A, B, K, O in [(16, 16, 16, 800, 4),     # flat TG=8 (production)
                          (2, 40, 136, 256, 4)]:    # tiled path
        X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
        Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
        b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
        W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32))
        b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32))
        out = np.asarray(grid_head_pallas(X, Y, b1, W2, b2, fast_dot=True))
        with _highest_precision():
            ref = np.asarray(grid_head_reference(X, Y, b1, W2, b2))
        # logits are K~800-deep sums of O(1) products; one-pass bf16
        # operand rounding gives ~2^-9 error relative to the LOGIT SCALE
        # (near-zero logits see it as a large relative error — bound the
        # absolute error against the output scale instead)
        scale = np.abs(ref).max()
        err = np.abs(out - ref).max()
        assert err <= 0.01 * scale, (
            f"{(G, A, B, K, O)}: max err {err:.4f} vs scale {scale:.1f}")


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


def test_stream_lstm_kernel_on_tpu():
    """r2 streaming recurrence: bit-exact on real Mosaic DMA (negative perf
    result at production shape — see icl/ops/lstm_kernel.py docstring)."""
    _require_tpu()
    from icl.models.rnn import BiLSTM
    from icl.ops.lstm_kernel import bilstm_apply_stream
    rng = np.random.default_rng(7)
    B, L, D, H = 64, 12, 20, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=B).astype(np.int32))
    m = BiLSTM(hidden=H)
    params = m.init(jax.random.PRNGKey(0), x, lengths)["params"]
    with _highest_precision():
        seq_ref, fin_ref = m.apply({"params": params}, x, lengths)
        seq_k, fin_k = bilstm_apply_stream(x, lengths, params, hidden=H)
    np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(seq_ref))
    np.testing.assert_array_equal(np.asarray(fin_k), np.asarray(fin_ref))


def test_grid_head_train_kernel_on_tpu():
    """grid_head_train custom VJP on real Mosaic: rate=0 oracle equality,
    dropout determinism, and fwd/bwd mask consistency via linearity probes
    (the dropout path has no XLA twin — interpret mode cannot lower
    prng_seed, so this coverage only exists here)."""
    _require_tpu()
    from icl.ops.grid_head import grid_head_reference
    from icl.ops.grid_head_train import grid_head_train

    rng = np.random.default_rng(3)
    G, A, B, K, O = 4, 16, 16, 256, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, size=(G,)), jnp.int32)
    R = jnp.asarray(rng.normal(size=(G, A, B, O)).astype(np.float32))

    with _highest_precision():
        # rate=0: forward + every gradient matches the XLA oracle
        out = grid_head_train(X, Y, b1, W2, b2, seeds, 0.0, True)
        ref = grid_head_reference(X, Y, b1, W2, b2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   atol=1e-4, rtol=1e-4)
        gk = jax.grad(lambda *p: jnp.sum(grid_head_train(*p, seeds, 0.0, True) * R),
                      argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
        go = jax.grad(lambda *p: jnp.sum(grid_head_reference(*p) * R),
                      argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
        for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
            scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=2e-4 * scale, rtol=1e-3,
                                       err_msg=name)

        # dropout: deterministic in seeds, sensitive to them
        rate = 0.5
        o1 = grid_head_train(X, Y, b1, W2, b2, seeds, rate)
        o2 = grid_head_train(X, Y, b1, W2, b2, seeds, rate)
        assert bool((np.asarray(o1) == np.asarray(o2)).all())
        o3 = grid_head_train(X, Y, b1, W2, b2, seeds + 1, rate)
        assert bool((np.asarray(o1) != np.asarray(o3)).any())

        # out is EXACTLY linear in W2 given a fixed mask ⇒ grad == finite
        # difference iff the backward regenerated the forward's mask
        E = jnp.asarray(rng.normal(size=W2.shape).astype(np.float32) * 0.01)
        L = lambda w: jnp.sum(grid_head_train(X, Y, b1, w, b2, seeds, rate, True) * R)
        lin = float(L(W2 + E) - L(W2))
        dot = float(jnp.sum(jax.grad(L)(W2) * E))
        assert abs(lin - dot) / max(abs(lin), 1e-9) < 1e-3, (lin, dot)

        # dX/dz mask consistency: with b1 ≫ |X|+|Y| every z stays positive,
        # so the function is EXACTLY linear in X (no relu kinks) given a
        # fixed mask — grad == finite difference iff the backward's dz mask
        # equals the forward's (a naive small-eps fd probe here is
        # cancellation-limited; this exact-linearity form is not)
        b1_pos = jnp.full_like(b1, 4.0)
        EX = jnp.asarray(rng.normal(size=X.shape).astype(np.float32) * 0.1)
        LX = lambda x: jnp.sum(
            grid_head_train(x, Y, b1_pos, W2, b2, seeds, rate, True) * R)
        lin = float(LX(X + EX) - LX(X))
        dot = float(jnp.sum(jax.grad(LX)(X) * EX))
        assert abs(lin - dot) / max(abs(lin), 1e-9) < 1e-3, (lin, dot)


def test_grid_head_train_loss_kernel_on_tpu():
    """In-kernel CE with real Mosaic dropout: because grid_head_train and
    grid_head_train_loss regenerate the SAME per-(image, tile) PRNG masks
    from the same seeds, the loss kernel must equal grid_ce_sums over the
    materialized grid at ANY rate — forward and every gradient."""
    _require_tpu()
    from icl.ops.grid_head_train import (grid_ce_sums, grid_head_train,
                                         grid_head_train_loss)

    rng = np.random.default_rng(5)
    G, A, B, K, O = 4, 16, 24, 256, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, size=(G,)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, O, size=(G, A, B)), jnp.int32)
    weights = jnp.asarray(
        (rng.random(size=(G, A, B)) > 0.25).astype(np.float32)
        * rng.choice([0.3, 1.0], size=(G, A, B)))

    with _highest_precision():
        for rate in (0.0, 0.5):
            out = grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels,
                                       weights, rate, True)
            ref = grid_ce_sums(
                grid_head_train(X, Y, b1, W2, b2, seeds, rate, True),
                labels, weights)
            for name, a, b in zip(["loss_sum", "hits", "nvalid"], out, ref):
                np.testing.assert_allclose(float(a), float(b), rtol=1e-5,
                                           err_msg=f"{name}@rate={rate}")

            def lk(*p, _r=rate):
                return grid_head_train_loss(*p, seeds, labels, weights,
                                            _r, True)[0]

            def lo(*p, _r=rate):
                return grid_ce_sums(grid_head_train(*p, seeds, _r, True),
                                    labels, weights)[0]

            gk = jax.grad(lk, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
            go = jax.grad(lo, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
            for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
                scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), atol=2e-4 * scale,
                    rtol=1e-3, err_msg=f"{name}@rate={rate}")


def test_fused_train_step_on_tpu(tmp_path):
    """One fused (grid-kernel) train step per grid model on real data:
    finite loss, and at dropout=0 the fused step's gradients match the
    gather-path step's gradients."""
    _require_tpu()
    from icl.testing.synth import SynthConfig, generate_dataset
    from icl.data.embeddings import EmbeddingStore
    from icl.data.imagebatch import AffinityBatcher, RelationBatcher
    from icl.data.pipeline import load_affinity_dataset, load_relation_dataset
    from icl.models import AffinityModel, RelationModel
    from icl.train import (create_train_state, make_affinity_train_step,
                           make_relation_train_step)

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=4, seed=2))
    emb = EmbeddingStore.load(d + "/embeddings.txt")
    table = jnp.asarray(emb.table)

    with _highest_precision():
        rds = load_relation_dataset(d, "train", emb)
        rb = next(iter(RelationBatcher(images_per_batch=4).batches(rds)))
        jb = {k: jnp.asarray(v) for k, v in rb.arrays.items()}
        # dropout=0: fused ≡ gather gradients (same math, kernel vs XLA)
        params = None
        grads_by_path = {}
        for fused in (False, True):
            model = RelationModel(lstm_hidden=16, head_hidden=32,
                                  dropout=0.0, fused=fused)
            st = create_train_state(model, (table, jb), seed=0)
            if params is None:
                params = st.params
            st = st.replace(params=params)
            st2, m = make_relation_train_step(donate=False)(st, table, jb)
            assert np.isfinite(float(m["loss"])), f"fused={fused}"
            grads_by_path[fused] = jax.tree.map(np.asarray, st2.params)
        flat_a = jax.tree_util.tree_leaves(grads_by_path[False])
        flat_b = jax.tree_util.tree_leaves(grads_by_path[True])
        for a, b in zip(flat_a, flat_b):
            np.testing.assert_allclose(a, b, atol=5e-5, rtol=1e-3)

        # dropout>0 fused: runs, finite, and changes params
        model = RelationModel(lstm_hidden=16, head_hidden=32,
                              dropout=0.5, fused=True)
        st = create_train_state(model, (table, jb), seed=0)
        st2, m = make_relation_train_step(donate=False)(st, table, jb)
        assert np.isfinite(float(m["loss"]))

        ads = load_affinity_dataset(d, "train", emb)
        ab = next(iter(AffinityBatcher(images_per_batch=4).batches(ads)))
        jab = {k: jnp.asarray(v) for k, v in ab.arrays.items()}
        amodel = AffinityModel(lstm_hidden=16, head_hidden=64,
                               dropout=0.5, fused=True)
        ast = create_train_state(amodel, (table, jab), seed=0)
        ast, m = make_affinity_train_step()(ast, table, jab)
        assert np.isfinite(float(m["loss"]))


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


def test_grid_head_train_nonexact_path_on_tpu():
    """Production (exact=False) kernels: f32 elementwise + one-pass-bf16
    MXU dots + pre-folded b1 (full-bf16 elementwise is negative result #3 —
    see icl.ops.grid_head_train._cd).  Gate both train kernels against the
    exact-f32 path at bf16-dot tolerances, with real Mosaic dropout checked
    for mask agreement between the loss kernel and grid_head_train (same
    seeds → bit-identical masks across head-dot precisions)."""
    _require_tpu()
    from icl.ops.grid_head_train import (grid_ce_sums, grid_head_train,
                                         grid_head_train_loss)

    rng = np.random.default_rng(17)
    G, A, B, K, O = 4, 16, 24, 256, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, size=(G,)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, O, size=(G, A, B)), jnp.int32)
    weights = jnp.asarray(
        (rng.random(size=(G, A, B)) > 0.25).astype(np.float32))

    # forward grid: bf16 vs exact-f32 kernel (rate=0 → deterministic)
    out_bf = grid_head_train(X, Y, b1, W2, b2, seeds, 0.0, False)
    out_f32 = grid_head_train(X, Y, b1, W2, b2, seeds, 0.0, True)
    np.testing.assert_allclose(np.asarray(out_bf), np.asarray(out_f32),
                               atol=0.05, rtol=0.02)

    for rate in (0.0, 0.5):
        # loss kernel bf16 vs the SAME-masks bf16 grid kernel + XLA CE:
        # mask agreement is exact, so only head-dot rounding differs
        lbf = grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels,
                                   weights, rate, False)
        lref = grid_ce_sums(
            grid_head_train(X, Y, b1, W2, b2, seeds, rate, False),
            labels, weights)
        np.testing.assert_allclose(float(lbf[0]), float(lref[0]),
                                   rtol=5e-3, err_msg=f"loss@rate={rate}")
        assert float(lbf[2]) == float(lref[2])  # nvalid is precision-free

        gk = jax.grad(lambda *p, _r=rate: grid_head_train_loss(
            *p, seeds, labels, weights, _r, False)[0],
            argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
        go = jax.grad(lambda *p, _r=rate: grid_ce_sums(
            grid_head_train(*p, seeds, _r, False),
            labels, weights)[0],
            argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
        for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
            scale = max(float(np.abs(np.asarray(b)).max()), 1e-3)
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=0.03 * scale, rtol=0.05,
                err_msg=f"{name}@rate={rate}")
