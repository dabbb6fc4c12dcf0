"""grid_head_train custom-VJP vs the XLA oracle (rate=0, CPU interpret).

The dropout path (rate>0) needs the real Mosaic PRNG — interpret mode cannot
lower ``prng_seed`` — so its mask-consistency/linearity probes live in
tests/tpu/test_tpu_smoke.py. Here: forward equality and exact gradients for
every differentiable input against jax.grad of the materialized-grid oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.ops.grid_head import grid_head_reference
from icl.ops.grid_head_train import grid_head_train


@pytest.fixture(scope="module")
def problem():
    rng = np.random.default_rng(7)
    G, A, B, K, O = 3, 10, 13, 256, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, size=(G,)), jnp.int32)
    R = jnp.asarray(rng.normal(size=(G, A, B, O)).astype(np.float32))
    return X, Y, b1, W2, b2, seeds, R


def test_forward_matches_oracle(problem):
    X, Y, b1, W2, b2, seeds, _ = problem
    out = grid_head_train(X, Y, b1, W2, b2, seeds, 0.0, True)
    ref = grid_head_reference(X, Y, b1, W2, b2)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5, rtol=1e-5)


def test_gradients_match_oracle(problem):
    X, Y, b1, W2, b2, seeds, R = problem

    def loss_kernel(X, Y, b1, W2, b2):
        return jnp.sum(grid_head_train(X, Y, b1, W2, b2, seeds, 0.0, True) * R)

    def loss_oracle(X, Y, b1, W2, b2):
        return jnp.sum(grid_head_reference(X, Y, b1, W2, b2) * R)

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=1e-4,
                                   err_msg=name)


def test_value_and_grad_under_jit(problem):
    """The custom VJP composes with jit + value_and_grad (the train-step
    usage) and pads non-multiple A/B correctly."""
    X, Y, b1, W2, b2, seeds, R = problem

    @jax.jit
    def f(params):
        X, W2 = params
        return jnp.sum(grid_head_train(X, Y, b1, W2, b2, seeds, 0.0) ** 2)

    val, grads = jax.value_and_grad(f)((X, W2))
    assert np.isfinite(float(val))
    assert all(np.isfinite(np.asarray(g)).all() for g in grads)
