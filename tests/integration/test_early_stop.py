"""--early_stop: the Keras-era EarlyStopping monitoring as a loop hook —
stop once the --eval_every dev loss has gone N consecutive evals without
improvement."""

import os
from types import SimpleNamespace

import pytest

from icl.train.loop import LoopConfig, run_training


def test_loop_stops_after_stale_evals_and_restores_best():
    import jax.numpy as jnp
    import numpy as np

    from icl.models import NonvisualModel
    from icl.train import create_train_state

    model = NonvisualModel(hidden=4, dropout=0.0, num_classes=2)
    state0 = create_train_state(model, (jnp.zeros((1, 3), jnp.float32),))
    losses = iter([1.0, 0.9, 0.9, 0.9, 0.8, 0.8])   # best improves at eval 2

    def step_fn(s, _x):
        return s.replace(step=s.step + 1), {"loss": 1.0}

    def eval_fn(_s):
        return {"loss": next(losses)}

    def make_batches(_rng, skip=0):
        return iter([(i,) for i in range(skip, 5)])

    final = run_training(state0, step_fn, make_batches,
                         LoopConfig(epochs=10, eval_every=1, early_stop=2),
                         eval_fn=eval_fn)
    # evals: 1.0 (best @1), 0.9 (best @2), 0.9 (stale 1), 0.9 (stale 2 ->
    # stop at step 4) — and restore_best_weights rolls back to step 2
    assert int(np.asarray(final.step)) == 2


def test_loop_runs_out_without_early_stop():
    def step_fn(s, _x):
        return SimpleNamespace(step=s.step + 1), {"loss": 1.0}

    def make_batches(_rng, skip=0):
        return iter([(i,) for i in range(skip, 5)])

    final = run_training(SimpleNamespace(step=0), step_fn, make_batches,
                         LoopConfig(epochs=2, eval_every=1, early_stop=0),
                         eval_fn=lambda s: {"loss": 1.0})
    assert final.step == 10


def test_cli_flag_requires_eval_every(tmp_path):
    from icl.cli import relation as rel_cli
    from icl.testing import SynthConfig, generate_dataset

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=2, seed=41))
    with pytest.raises(SystemExit):
        rel_cli.main(["--train", "--data_dir", d, "--early_stop", "2"])


def test_cli_early_stop_end_to_end(tmp_path):
    """lr=0 keeps the dev loss flat, so training stops after the second
    eval instead of running all epochs."""
    import json

    from icl.cli import nonvisual as nv_cli
    from icl.testing import SynthConfig, generate_dataset

    d = str(tmp_path)
    generate_dataset(d, "train", SynthConfig(num_images=3, seed=42))
    generate_dataset(d, "dev", SynthConfig(num_images=2, seed=43))
    metrics = str(tmp_path / "m.jsonl")
    nv_cli.main(["--train", "--data_dir", d, "--epochs", "50",
                 "--learn_rate", "0", "--eval_every", "1",
                 "--eval_batches", "1", "--early_stop", "1",
                 "--metrics_file", metrics])
    evals = [json.loads(l) for l in open(metrics) if "eval_loss" in l]
    # first eval sets best, second is not an improvement -> stop
    assert len(evals) == 2
    # restore_best_weights + tail pruning: the model dir's latest
    # checkpoint is the best-eval step (1), not the rejected step 2
    from icl.train.checkpoint import Checkpointer
    assert Checkpointer(os.path.join(d, "nonvisual.model")).latest_step == 1
