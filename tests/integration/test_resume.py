"""Fault tolerance: kill-and-resume equals an uninterrupted run (SURVEY §7.4).

The reference lost the run on any crash (SURVEY §5.3).  Here: run A trains
2N steps straight; run B trains N steps, "crashes" (process state discarded),
relaunches with --resume auto for the remaining epochs; final params match.
"""

import numpy as np

import jax
import jax.numpy as jnp

from icl.data.pipeline import load_mention_dataset
from icl.models import NonvisualModel
from icl.models.nonvisual import mean_pool_tokens
from icl.train import create_train_state, make_mention_train_step
from icl.train.loop import LoopConfig, run_training


def _setup(synth_dir, emb):
    ds = load_mention_dataset(synth_dir, "train", "nonvisual", emb)
    table = jnp.asarray(emb.table)
    model = NonvisualModel(hidden=16)
    pooled = mean_pool_tokens(table, jnp.asarray(ds.token_ids[:1]),
                              jnp.asarray(ds.lengths[:1]))
    args = (jnp.asarray(ds.token_ids), jnp.asarray(ds.lengths),
            jnp.asarray(ds.labels), jnp.ones(len(ds.ids), bool))
    return model, pooled, table, args


def _make_batches_fn(args):
    def make_batches(epoch_rng):
        yield args
    return make_batches


def test_kill_mid_epoch_with_shuffling(tmp_path, synth_dir, emb):
    """Kill inside a shuffled epoch; resume must replay the exact schedule
    (stateless epoch rngs + (epoch, batch) position in the checkpoint)."""
    from icl.train.checkpoint import Checkpointer

    model, pooled, table, args = _setup(synth_dir, emb)
    tok, ln, lb, vd = args
    n = int(tok.shape[0]) // 2 * 2
    half = n // 2

    def make_batches(epoch_rng):
        # 2 shuffled half-batches per epoch — order depends on epoch_rng
        order = epoch_rng.permutation(n)
        for s in range(0, n, half):
            idx = order[s:s + half]
            yield (tok[idx], ln[idx], lb[idx], vd[idx])

    step = make_mention_train_step(donate=False)
    wrapped = lambda s, *a: step(s, table, *a)

    # uninterrupted: 3 epochs x 2 batches, checkpoint EVERY step
    stA = create_train_state(model, (pooled,), seed=9)
    stA = run_training(stA, wrapped, make_batches,
                       LoopConfig(epochs=3, ckpt_dir=None, seed=9))

    # interrupted: run with ckpt_every=1, then hard-truncate to the state
    # after step 3 (mid-epoch-2) by restoring that checkpoint and resuming
    ckA = str(tmp_path / "ck_mid")
    stB = create_train_state(model, (pooled,), seed=9)
    # train only 3 steps by limiting epochs? simulate a kill: run full but
    # resume from the step-3 checkpoint in a fresh state
    run_training(stB, wrapped, make_batches,
                 LoopConfig(epochs=3, ckpt_dir=ckA, ckpt_every=1, seed=9))
    ck = Checkpointer(ckA)
    # pick the mid-epoch checkpoint at step 3 (epoch 1, batch 1 done)
    stC = create_train_state(model, (pooled,), seed=9)
    template = stC
    payload_steps = ck._mgr.all_steps()
    # max_to_keep=3 prunes early steps; step 5 is mid-epoch-2 (batch 1 of 2)
    assert 5 in payload_steps
    restored = ck._mgr.restore(
        5, args=__import__("orbax.checkpoint", fromlist=["args"]).args
        .StandardRestore({
            "params": jax.tree.map(np.asarray, template.params),
            "opt_state": jax.tree.map(np.asarray, template.opt_state),
            "step": 0, "rng": np.asarray(template.rng),
            "epoch": 0, "batch_in_epoch": 0}))
    assert restored["epoch"] == 2 and restored["batch_in_epoch"] == 1
    # fresh dir seeded with only that checkpoint via save(), then resume
    ckB = str(tmp_path / "ck_resume")
    ck2 = Checkpointer(ckB)
    stC = stC.replace(
        params=jax.tree.map(jnp.asarray, restored["params"]),
        opt_state=jax.tree.map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32),
        rng=jnp.asarray(restored["rng"]))
    ck2.save(stC, wait=True, epoch=restored["epoch"],
             batch_in_epoch=restored["batch_in_epoch"])
    ck2.close()
    stD = create_train_state(model, (pooled,), seed=9)
    stD = run_training(stD, wrapped, make_batches,
                       LoopConfig(epochs=3, ckpt_dir=ckB, ckpt_every=0,
                                  resume="auto", seed=9))
    assert int(stD.step) == int(stA.step) == 6
    for a, b in zip(jax.tree.leaves(stA.params), jax.tree.leaves(stD.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_kill_and_resume(tmp_path, synth_dir, emb):
    model, pooled, table, args = _setup(synth_dir, emb)
    step = make_mention_train_step(donate=False)
    wrapped = lambda s, *a: step(s, table, *a)

    # uninterrupted: 8 epochs (1 step per epoch)
    stA = create_train_state(model, (pooled,), seed=3)
    stA = run_training(stA, wrapped, _make_batches_fn(args),
                       LoopConfig(epochs=8, ckpt_dir=None, seed=3))

    # interrupted: 4 epochs, checkpoint, fresh process state, resume to the
    # 8-epoch TOTAL (epochs is a total, not an increment)
    ck = str(tmp_path / "ckpt")
    stB = create_train_state(model, (pooled,), seed=3)
    stB = run_training(stB, wrapped, _make_batches_fn(args),
                       LoopConfig(epochs=4, ckpt_dir=ck, ckpt_every=1, seed=3))
    del stB  # simulate crash: all in-memory state gone
    stB2 = create_train_state(model, (pooled,), seed=3)
    stB2 = run_training(stB2, wrapped, _make_batches_fn(args),
                        LoopConfig(epochs=8, ckpt_dir=ck, ckpt_every=1,
                                   resume="auto", seed=3))

    assert int(stB2.step) == int(stA.step) == 8
    for a, b in zip(jax.tree.leaves(stA.params), jax.tree.leaves(stB2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_resume_skips_without_host_replay(tmp_path, synth_dir, emb):
    """A skip-aware make_batches must be invoked with skip=N on resume and
    asked to BUILD only the remaining batches (VERDICT r1 missing#4 /
    CLAUDE.md round-2 note: no host-side generator replay)."""
    from icl.train.checkpoint import Checkpointer

    model, pooled, table, args = _setup(synth_dir, emb)
    tok, ln, lb, vd = args
    n = int(tok.shape[0]) // 2 * 2
    half = n // 2
    built = []          # (epoch_call_idx, batch_idx_built)
    skips_seen = []

    def make_batches(epoch_rng, skip=0):
        skips_seen.append(skip)
        order = epoch_rng.permutation(n)
        for k, s in enumerate(range(0, n, half)):
            if k < skip:
                continue  # schedule entry dropped WITHOUT building
            built.append(k)
            idx = order[s:s + half]
            yield (tok[idx], ln[idx], lb[idx], vd[idx])

    step = make_mention_train_step(donate=False)
    wrapped = lambda s, *a: step(s, table, *a)

    # train 2 epochs x 2 batches, checkpointing every step; then resume
    # from the mid-epoch-1 checkpoint (step 3 = epoch 1, batch 1 done)
    ck_dir = str(tmp_path / "ck_skip")
    st = create_train_state(model, (pooled,), seed=4)
    st = run_training(st, wrapped, make_batches,
                      LoopConfig(epochs=2, ckpt_dir=ck_dir, ckpt_every=1,
                                 seed=4))
    final_step = int(st.step)
    assert final_step == 4

    built.clear()
    skips_seen.clear()
    # wipe the end-marker so resume lands mid-run: rebuild a dir holding
    # only the step-3 checkpoint
    ck = Checkpointer(ck_dir)
    import orbax.checkpoint as ocp
    import jax as _jax
    template = create_train_state(model, (pooled,), seed=4)
    restored = ck._mgr.restore(3, args=ocp.args.StandardRestore({
        "params": _jax.tree.map(np.asarray, template.params),
        "opt_state": _jax.tree.map(np.asarray, template.opt_state),
        "step": 0, "rng": np.asarray(template.rng),
        "epoch": 0, "batch_in_epoch": 0}))
    ck2_dir = str(tmp_path / "ck_skip2")
    ck2 = Checkpointer(ck2_dir)
    st2 = template.replace(
        params=_jax.tree.map(jnp.asarray, restored["params"]),
        opt_state=_jax.tree.map(jnp.asarray, restored["opt_state"]),
        step=jnp.asarray(restored["step"], jnp.int32),
        rng=jnp.asarray(restored["rng"]))
    ck2.save(st2, wait=True, epoch=restored["epoch"],
             batch_in_epoch=restored["batch_in_epoch"])
    ck2.close()

    st3 = create_train_state(model, (pooled,), seed=4)
    st3 = run_training(st3, wrapped, make_batches,
                       LoopConfig(epochs=2, ckpt_dir=ck2_dir, ckpt_every=0,
                                  resume="auto", seed=4))
    assert int(st3.step) == final_step
    # the resumed epoch was asked to skip its first batch and built ONLY
    # the remaining one — no host-side replay of trained batches
    assert skips_seen == [1]
    assert built == [1]


def test_async_save_join_and_roundtrip(tmp_path, synth_dir, emb):
    """Periodic saves run their host pull on a background thread (r4,
    VERDICT r3 weak#2); every other manager op joins it first, so
    latest_step/restore/wait must observe the save as if synchronous, and
    the restored state must be byte-equal to what was saved."""
    from icl.train.checkpoint import Checkpointer

    model, pooled, table, args = _setup(synth_dir, emb)
    state = create_train_state(model, (pooled,), seed=3)
    step = make_mention_train_step(donate=False)
    state, _ = step(state, table, *args)

    ck = Checkpointer(str(tmp_path / "ck"))
    ck.save(state)                      # async path (no wait/force)
    assert ck.latest_step == int(state.step)   # join-before-read
    ck.wait()                           # durable
    skel = create_train_state(model, (pooled,), seed=99)
    restored = ck.restore(skel)
    for a, b in zip(jax.tree.leaves(restored.params),
                    jax.tree.leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # a second async save at a new step supersedes the first
    state2, _ = step(state, table, *args)
    ck.save(state2)
    assert ck.latest_step == int(state2.step)
    ck.close()
