"""BiLSTM scan_form (negative result #5) stays bit-identical to the
materializing path — the measured record in icl/models/relation.py's
RelationModel.__call__ note only holds if the two coordinate systems
address the same values."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from icl.models.relation import gather_mention_reps, gather_mention_reps_scan
from icl.models.rnn import BiLSTM


@pytest.fixture(scope="module")
def bilstm_both_forms():
    rng = np.random.default_rng(7)
    B, L, D, H = 6, 9, 12, 8
    x = jnp.asarray(rng.normal(size=(B, L, D)).astype(np.float32))
    lengths = jnp.asarray(rng.integers(1, L + 1, B), jnp.int32)
    params = BiLSTM(H).init(jax.random.PRNGKey(0), x, lengths)
    seq, fin = BiLSTM(H).apply(params, x, lengths)
    hs, fin_s = BiLSTM(H, scan_form=True).apply(params, x, lengths)
    return seq, fin, hs, fin_s, lengths


def test_scan_form_final_state_identical(bilstm_both_forms):
    _, fin, _, fin_s, _ = bilstm_both_forms
    assert jnp.array_equal(fin, fin_s)


def test_scan_form_buffer_addresses_same_values(bilstm_both_forms):
    seq, _, hs, _, _ = bilstm_both_forms
    L, G, B, H = hs.shape
    # seq[b, p] == [hs[p, 0, b] ; hs[L-1-p, 1, b]]
    rebuilt = jnp.concatenate(
        [jnp.transpose(hs[:, 0], (1, 0, 2)),
         jnp.transpose(hs[:, 1], (1, 0, 2))[:, ::-1]], axis=-1)
    assert jnp.array_equal(seq, rebuilt)


def test_gather_mention_reps_scan_bit_identical(bilstm_both_forms):
    seq, _, hs, _, _ = bilstm_both_forms
    L, G, B, H = hs.shape
    I, C = 3, 2
    assert I * C == B
    enc = seq.reshape(I, C, L, 2 * H)
    rng = np.random.default_rng(11)
    M = 5
    m_cap = jnp.asarray(rng.integers(0, C, (I, M)), jnp.int32)
    m_first = jnp.asarray(rng.integers(0, L, (I, M)), jnp.int32)
    m_last = jnp.minimum(
        m_first + jnp.asarray(rng.integers(0, 3, (I, M)), jnp.int32), L - 1)
    a = gather_mention_reps(enc, m_cap, m_first, m_last)
    b = gather_mention_reps_scan(hs, C, m_cap, m_first, m_last)
    assert jnp.array_equal(a, b)
