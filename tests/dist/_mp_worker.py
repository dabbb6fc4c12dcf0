"""Worker for the 2-process jax.distributed test (not a test module).

Each process: 4 local faked CPU devices → 8 global; bootstrap through
``icl.runtime.init`` (the real multi-host path, VERDICT r1 missing#1/#2),
train the nonvisual FFNN 5 DP steps on a deterministic synthetic batch, and
dump the final (replicated) params to ``<out>/params_<pid>.npz``.

Usage: python _mp_worker.py <process_id> <num_processes> <port> <out_dir> [model]
(model: "nonvisual" — FFNN; "relation" — BiLSTM, globally-fed batches;
"relation-local" — BiLSTM with multi-host INPUT sharding: each process
builds only its local batch rows and feeds via shard_batch_local)
"""

import os
import sys

import numpy as np


def synth_batch():
    """Deterministic batch identical on every process (numpy, seed-pinned)."""
    rng = np.random.default_rng(123)
    table = rng.normal(size=(50, 16)).astype(np.float32)
    tok = rng.integers(1, 50, size=(64, 4)).astype(np.int32)
    ln = rng.integers(1, 5, size=(64,)).astype(np.int32)
    lb = rng.integers(0, 2, size=(64,)).astype(np.int32)
    return table, tok, ln, lb


def synth_relation():
    """Deterministic relation batch (identical on every process)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))))
    import __graft_entry__ as ge

    rng = np.random.default_rng(321)
    table = rng.normal(size=(60, 12)).astype(np.float32)
    batch = ge._synth_relation_batch(rng, I=8, C=2, L=6, M=4, vocab=60)
    return table, batch


def main():
    # all jax config mutation lives HERE, not at module level: the test
    # process imports this module for synth_batch() and must not have its
    # own 8-faked-device config clobbered
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)

    pid, nproc, port, out = (int(sys.argv[1]), int(sys.argv[2]),
                             sys.argv[3], sys.argv[4])
    which = sys.argv[5] if len(sys.argv) > 5 else "nonvisual"
    from icl import runtime
    from icl.dist.mesh import replicate, shard_batch
    from icl.models import NonvisualModel, RelationModel
    from icl.models.nonvisual import mean_pool_tokens
    from icl.train import (create_train_state, make_mention_train_step,
                           make_relation_train_step)

    rt = runtime.init(topology="8x1", seed=0,
                      coordinator=f"localhost:{port}",
                      num_processes=nproc, process_id=pid)
    assert jax.device_count() == 8, jax.device_count()
    assert jax.process_count() == nproc

    import jax.numpy as jnp
    if which.startswith("relation"):
        from icl.dist.mesh import local_data_rows, shard_batch_local
        table_h, batch = synth_relation()
        model = RelationModel(lstm_hidden=6, head_hidden=12)
        st = create_train_state(model, (jnp.asarray(table_h), batch), seed=5)
        st = replicate(st, rt.mesh)
        table = replicate(jnp.asarray(table_h), rt.mesh)
        if which == "relation-local":
            # each process holds ONLY its local rows — the other rows are
            # never materialized on this host
            lo, hi = local_data_rows(rt.mesh, 8)
            local = {k: np.asarray(v)[lo:hi] for k, v in batch.items()}
            sbatch = shard_batch_local(local, rt.mesh, 8)
        else:
            sbatch = shard_batch(batch, rt.mesh)
        step = make_relation_train_step(class_weights=[0.3, 1, 1, 1],
                                        donate=False)
        for _ in range(3):
            st, metrics = step(st, table, sbatch)
        flat = {"/".join(str(k.key) for k in path): np.asarray(v)
                for path, v in
                jax.tree_util.tree_flatten_with_path(st.params)[0]}
        np.savez(os.path.join(out, f"params_{pid}.npz"),
                 loss=float(metrics["loss"]), **flat)
        print(f"worker {pid}/{nproc} relation: OK "
              f"loss={float(metrics['loss']):.6f}", flush=True)
        return
    table_h, tok, ln, lb = synth_batch()
    vd = np.ones(64, bool)
    model = NonvisualModel(hidden=8)
    pooled = mean_pool_tokens(jnp.asarray(table_h), jnp.asarray(tok[:1]),
                              jnp.asarray(ln[:1]))
    st = create_train_state(model, (pooled,), seed=5)
    st = replicate(st, rt.mesh)
    table = replicate(jnp.asarray(table_h), rt.mesh)
    args = shard_batch((tok, ln, lb, vd), rt.mesh)
    step = make_mention_train_step(donate=False)
    for _ in range(5):
        st, metrics = step(st, table, *args)
    # params are fully replicated → every process holds addressable shards
    flat = {"/".join(str(k.key) for k in path): np.asarray(v)
            for path, v in jax.tree_util.tree_flatten_with_path(st.params)[0]}
    np.savez(os.path.join(out, f"params_{pid}.npz"),
             loss=float(metrics["loss"]), **flat)
    print(f"worker {pid}/{nproc}: OK loss={float(metrics['loss']):.6f}",
          flush=True)


if __name__ == "__main__":
    main()
