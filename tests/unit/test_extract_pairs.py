"""_extract_pairs (one-hot MXU pair extraction) must equal the gather BITWISE.

The fused relation paths extract [I,P,O] pair logits from the [I,M,M,O]
grid via a one-hot einsum pinned to 'highest' precision (r3 ledger: 8x
faster than the 4-wide-row gather on TPU).  Exactness is a correctness
contract, not a tolerance: .scores byte-determinism and the 1e-5 oracle
parity gate both sit downstream.
"""

import numpy as np

import jax
import jax.numpy as jnp

from icl.models.relation import _extract_pairs


def _gather_oracle(grid, pair_ij):
    I = grid.shape[0]
    ii = jnp.arange(I, dtype=jnp.int32)[:, None]
    return grid[ii, pair_ij[:, :, 0], pair_ij[:, :, 1]]


def test_extract_pairs_bitwise_equals_gather():
    rng = np.random.default_rng(0)
    I, M, O, P = 4, 7, 4, 21
    grid = jnp.asarray(rng.normal(size=(I, M, M, O)).astype(np.float32)
                       * 100.0)
    iu, ju = np.triu_indices(M, k=1)
    pair_ij = jnp.asarray(np.broadcast_to(
        np.stack([iu, ju], 1)[None], (I, P, 2)).astype(np.int32).copy())
    got = np.asarray(_extract_pairs(grid, pair_ij))
    want = np.asarray(_gather_oracle(grid, pair_ij))
    np.testing.assert_array_equal(got, want)


def test_extract_pairs_padded_duplicate_indices():
    """Batcher padding repeats in-range indices (commonly (0,0)) — the
    one-hot form must reproduce the gather for duplicates too, and stay
    bitwise under jit and the session's default 'high' matmul policy
    (the einsum pins its own precision)."""
    rng = np.random.default_rng(1)
    I, M, O = 2, 5, 4
    grid = jnp.asarray(rng.normal(size=(I, M, M, O)).astype(np.float32))
    pair_ij = jnp.asarray(np.array(
        [[[0, 1], [0, 0], [0, 0], [4, 4]],
         [[3, 2], [2, 3], [0, 0], [0, 0]]], np.int32))
    prev = jax.config.jax_default_matmul_precision
    try:
        jax.config.update("jax_default_matmul_precision", "high")
        got = np.asarray(jax.jit(_extract_pairs)(grid, pair_ij))
    finally:
        jax.config.update("jax_default_matmul_precision", prev)
    want = np.asarray(_gather_oracle(grid, pair_ij))
    np.testing.assert_array_equal(got, want)


def test_extract_pairs_randomized_shapes_bitwise():
    """Fuzz shapes and indices: any in-range [I,P,2] index set (dupes,
    out-of-order, self-pairs) must reproduce the gather bitwise."""
    for seed in range(8):
        rng = np.random.default_rng(seed)
        I = int(rng.integers(1, 5))
        M = int(rng.integers(2, 23))
        P = int(rng.integers(1, 40))
        O = int(rng.integers(2, 7))
        grid = jnp.asarray(
            (rng.normal(size=(I, M, M, O)) * 10 ** rng.integers(-3, 4)
             ).astype(np.float32))
        pair_ij = jnp.asarray(
            rng.integers(0, M, size=(I, P, 2)).astype(np.int32))
        got = np.asarray(_extract_pairs(grid, pair_ij))
        want = np.asarray(_gather_oracle(grid, pair_ij))
        np.testing.assert_array_equal(got, want, err_msg=f"seed={seed}")


def test_extract_pairs_gradient_matches_gather():
    """The fused TRAIN pair-form path differentiates through the
    extraction: the one-hot transpose must scatter-add cotangents exactly
    like the gather transpose (duplicate padded pairs accumulate)."""
    rng = np.random.default_rng(2)
    I, M, O = 2, 4, 4
    grid = jnp.asarray(rng.normal(size=(I, M, M, O)).astype(np.float32))
    pair_ij = jnp.asarray(np.array(
        [[[0, 1], [0, 0], [0, 0]],
         [[1, 2], [2, 1], [3, 3]]], np.int32))
    ct = jnp.asarray(rng.normal(size=(I, 3, O)).astype(np.float32))

    def f_new(g):
        return (ct * _extract_pairs(g, pair_ij)).sum()

    def f_old(g):
        return (ct * _gather_oracle(g, pair_ij)).sum()

    g_new = np.asarray(jax.grad(f_new)(grid))
    g_old = np.asarray(jax.grad(f_old)(grid))
    np.testing.assert_allclose(g_new, g_old, atol=1e-6, rtol=0)
