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


def test_kill_and_resume(tmp_path, synth_dir, emb):
    model, pooled, table, args = _setup(synth_dir, emb)
    step = make_mention_train_step(donate=False)
    wrapped = lambda s, *a: step(s, table, *a)

    # uninterrupted: 8 epochs (1 step per epoch)
    stA = create_train_state(model, (pooled,), seed=3)
    stA = run_training(stA, wrapped, _make_batches_fn(args),
                       LoopConfig(epochs=8, ckpt_dir=None, seed=3))

    # interrupted: 4 epochs, checkpoint, fresh process state, resume 4 more
    ck = str(tmp_path / "ckpt")
    stB = create_train_state(model, (pooled,), seed=3)
    stB = run_training(stB, wrapped, _make_batches_fn(args),
                       LoopConfig(epochs=4, ckpt_dir=ck, ckpt_every=1, seed=3))
    del stB  # simulate crash: all in-memory state gone
    stB2 = create_train_state(model, (pooled,), seed=3)
    stB2 = run_training(stB2, wrapped, _make_batches_fn(args),
                        LoopConfig(epochs=4, ckpt_dir=ck, ckpt_every=1,
                                   resume="auto", seed=3))

    assert int(stB2.step) == int(stA.step) == 8
    for a, b in zip(jax.tree.leaves(stA.params), jax.tree.leaves(stB2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
