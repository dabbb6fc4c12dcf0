"""K2 ranking kernel vs XLA oracle (interpret mode; TPU run in tests/tpu)."""

import numpy as np
import pytest

import jax.numpy as jnp


@pytest.mark.parametrize("G,A,B,K", [(2, 8, 16, 32), (1, 5, 7, 24),
                                     (2, 33, 12, 16)])
def test_rank_kernel_matches_reference(G, A, B, K):
    from jax.experimental.pallas import tpu as pltpu
    from icl.ops.affinity_rank import (affinity_rank_pallas,
                                       affinity_rank_reference)

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(G, A, K)).astype(np.float32))
    Y = jnp.asarray(rng.normal(size=(G, B, K)).astype(np.float32))
    b1 = jnp.asarray(rng.normal(size=(K,)).astype(np.float32))
    W2 = jnp.asarray(rng.normal(size=(K, 2)).astype(np.float32))
    b2 = jnp.asarray(rng.normal(size=(2,)).astype(np.float32))
    valid = rng.random((G, B)) < 0.8
    valid[:, 0] = True                       # at least one valid box per image
    valid = jnp.asarray(valid)
    ref = affinity_rank_reference(X, Y, b1, W2, b2, valid)
    with pltpu.force_tpu_interpret_mode():
        out = affinity_rank_pallas(X, Y, b1, W2, b2, valid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-6)
    # rows sum to 1; invalid cells are exactly zero
    np.testing.assert_allclose(np.asarray(out).sum(-1), 1.0, atol=1e-5)
    assert (np.asarray(out)[~np.asarray(
        jnp.broadcast_to(valid[:, None, :], out.shape))] == 0).all()
