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
from icl.ops.grid_head_train import (grid_ce_sums, grid_head_train,
                                     grid_head_train_loss)


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


@pytest.fixture(scope="module")
def loss_cells(problem):
    X, Y, *_ = problem
    rng = np.random.default_rng(11)
    G, A, _ = X.shape
    B = Y.shape[1]
    labels = jnp.asarray(rng.integers(0, 4, size=(G, A, B)), jnp.int32)
    weights = jnp.asarray(
        (rng.random(size=(G, A, B)) > 0.25).astype(np.float32)
        * rng.choice([0.3, 1.0], size=(G, A, B)))
    return labels, weights


def test_loss_kernel_matches_oracle(problem, loss_cells):
    """In-kernel CE (Σ ce·w, Σ hits, Σ valid) vs grid_ce_sums over the
    materialized oracle grid — forward and every gradient (rate=0)."""
    X, Y, b1, W2, b2, seeds, _ = problem
    labels, weights = loss_cells

    out = grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels, weights,
                               0.0, True)
    ref = grid_ce_sums(grid_head_reference(X, Y, b1, W2, b2), labels, weights)
    for name, a, b in zip(["loss_sum", "hits", "nvalid"], out, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5,
                                   err_msg=name)

    def loss_kernel(X, Y, b1, W2, b2):
        return grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels,
                                    weights, 0.0, True)[0]

    def loss_oracle(X, Y, b1, W2, b2):
        return grid_ce_sums(grid_head_reference(X, Y, b1, W2, b2), labels,
                            weights)[0]

    gk = jax.grad(loss_kernel, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    go = jax.grad(loss_oracle, argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=1e-4,
                                   err_msg=name)


def test_loss_kernel_zero_weight_cells_are_inert(problem, loss_cells):
    """Cells with weight 0 contribute nothing to loss, hits, count, or
    gradients (padding/diagonal/missing-pair cells ride this)."""
    X, Y, b1, W2, b2, seeds, _ = problem
    labels, weights = loss_cells
    # poison the labels wherever weight == 0 — results must not move
    poisoned = jnp.where(weights > 0, labels, 3)
    a = grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels, weights,
                             0.0, True)
    b = grid_head_train_loss(X, Y, b1, W2, b2, seeds, poisoned, weights,
                             0.0, True)
    for x, y in zip(a, b):
        assert float(x) == float(y)
    ga = jax.grad(lambda X: grid_head_train_loss(
        X, Y, b1, W2, b2, seeds, labels, weights, 0.0, True)[0])(X)
    gb = jax.grad(lambda X: grid_head_train_loss(
        X, Y, b1, W2, b2, seeds, poisoned, weights, 0.0, True)[0])(X)
    np.testing.assert_array_equal(np.asarray(ga), np.asarray(gb))


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


def test_loss_kernel_multitile_matches_oracle():
    """Dims that span several [Ta,Tb] tiles take the general (non-flat)
    loss kernels — same oracle gate as the single-tile fast path."""
    rng = np.random.default_rng(23)
    G, A, B, K, O = 2, 40, 70, 128, 4
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32) * 0.3)
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32) * 0.3)
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32) * 0.1)
    W2 = jnp.asarray(rng.normal(size=(K, O)).astype(np.float32) * 0.1)
    b2 = jnp.asarray(rng.normal(size=(O,)).astype(np.float32) * 0.1)
    seeds = jnp.asarray(rng.integers(0, 2**31 - 1, size=(G,)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, O, size=(G, A, B)), jnp.int32)
    weights = jnp.asarray(
        (rng.random(size=(G, A, B)) > 0.25).astype(np.float32))

    out = grid_head_train_loss(X, Y, b1, W2, b2, seeds, labels, weights,
                               0.0, True)
    ref = grid_ce_sums(grid_head_reference(X, Y, b1, W2, b2), labels, weights)
    for name, a, b in zip(["loss_sum", "hits", "nvalid"], out, ref):
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5,
                                   err_msg=name)

    gk = jax.grad(lambda *p: grid_head_train_loss(
        *p, seeds, labels, weights, 0.0, True)[0],
        argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    go = jax.grad(lambda *p: grid_ce_sums(
        grid_head_reference(*p), labels, weights)[0],
        argnums=(0, 1, 2, 3, 4))(X, Y, b1, W2, b2)
    for name, a, b in zip(["dX", "dY", "db1", "dW2", "db2"], gk, go):
        scale = max(float(np.abs(np.asarray(b)).max()), 1.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-4 * scale, rtol=1e-4,
                                   err_msg=name)
