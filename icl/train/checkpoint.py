"""Orbax checkpoint/resume (SURVEY §5.3–5.4).

Reference parity: the reference saved Keras ``.h5`` weights once at the end
of training — a crash lost the run (SURVEY §5.3).  Here the *full* train
state (params, optimizer state, step, rng) checkpoints every N steps via
orbax, and ``--resume auto`` restores the latest checkpoint so a killed run
continues exactly (fault-tolerance test: tests/integration/test_resume.py).
The downstream contract is unaffected: `.scores` files remain the only
artifact the Java ILP consumes (SURVEY §5.4).
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from icl.train.state import TrainState


class Checkpointer:
    """Thin orbax CheckpointManager wrapper keyed by step."""

    def __init__(self, directory: str, max_to_keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=max_to_keep,
                                                 create=True),
        )

    def save(self, state: TrainState, wait: bool = False) -> None:
        payload = {
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": int(state.step),
            "rng": np.asarray(state.rng),
        }
        self._mgr.save(int(state.step), args=ocp.args.StandardSave(payload))
        if wait:
            self._mgr.wait_until_finished()

    @property
    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state: TrainState) -> TrainState:
        """Restore latest into the (freshly-initialized) state skeleton."""
        step = self._mgr.latest_step()
        if step is None:
            return state
        template = {
            "params": jax.tree.map(np.asarray, state.params),
            "opt_state": jax.tree.map(np.asarray, state.opt_state),
            "step": 0,
            "rng": np.asarray(state.rng),
        }
        restored = self._mgr.restore(step,
                                     args=ocp.args.StandardRestore(template))
        return state.replace(
            params=jax.tree.map(jax.numpy.asarray, restored["params"]),
            opt_state=jax.tree.map(jax.numpy.asarray, restored["opt_state"]),
            step=jax.numpy.asarray(restored["step"], jax.numpy.int32),
            rng=jax.numpy.asarray(restored["rng"]),
        )

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()
