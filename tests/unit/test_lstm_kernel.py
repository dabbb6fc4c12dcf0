"""Pallas BiLSTM kernel vs the XLA scan module (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.models.rnn import BiLSTM


@pytest.mark.parametrize("B,L,D,H", [(5, 9, 12, 8), (16, 12, 10, 16)])
def test_kernel_matches_scan(B, L, D, H):
    from jax.experimental.pallas import tpu as pltpu
    from icl.ops.lstm_kernel import bilstm_apply_pallas

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=B).astype(np.int32))
    m = BiLSTM(hidden=H)
    params = jax.tree.map(np.asarray,
                          m.init(jax.random.PRNGKey(0), x, lengths)["params"])
    seq_ref, fin_ref = m.apply({"params": params}, x, lengths)
    with pltpu.force_tpu_interpret_mode():
        seq_k, fin_k = bilstm_apply_pallas(x, lengths, params, hidden=H)
    np.testing.assert_allclose(np.asarray(fin_k), np.asarray(fin_ref),
                               rtol=1e-5, atol=1e-5)
    ln = np.asarray(lengths)
    for b in range(B):
        np.testing.assert_allclose(np.asarray(seq_k)[b, :ln[b]],
                                   np.asarray(seq_ref)[b, :ln[b]],
                                   rtol=1e-5, atol=1e-5)


def test_stream_kernel_matches_scan():
    """bilstm_apply_stream (r2 DMA-streaming recurrence) is bit-exact vs the
    BiLSTM scan — kept as a correctness-verified alternative even though it
    loses at the production shape (negative result #2, module docstring)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from icl.models.rnn import BiLSTM
    from icl.ops.lstm_kernel import bilstm_apply_stream

    rng = np.random.default_rng(5)
    B, L, D, H = 24, 11, 20, 16
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, size=B).astype(np.int32))
    m = BiLSTM(hidden=H)
    params = m.init(jax.random.PRNGKey(0), x, lengths)["params"]
    seq_ref, fin_ref = m.apply({"params": params}, x, lengths)
    seq_k, fin_k = bilstm_apply_stream(x, lengths, params, hidden=H)
    np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(seq_ref))
    np.testing.assert_array_equal(np.asarray(fin_k), np.asarray(fin_ref))
