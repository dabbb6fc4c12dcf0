"""LSTM/BiLSTM parity vs keras.layers.LSTM (SURVEY §7.3, §9.3 hard part #1).

Gate: max |jax − keras| ≤ 1e-5 fp32 on masked variable-length sequences,
for sequence outputs, final states, and both directions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from icl.models.rnn import LSTM, BiLSTM

GATE = 1e-5


@pytest.fixture(scope="module")
def seqs():
    rng = np.random.default_rng(42)
    B, L, D = 5, 9, 12
    x = rng.normal(size=(B, L, D)).astype(np.float32)
    lengths = np.array([9, 1, 4, 7, 5], dtype=np.int32)
    return x, lengths


def _init(module, x, lengths):
    params = module.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(lengths))["params"]
    return jax.tree.map(np.asarray, params)


def test_forward_lstm_matches_keras(seqs):
    from icl.eval.oracle import keras_lstm
    x, lengths = seqs
    m = LSTM(hidden=8)
    params = _init(m, x, lengths)
    seq_j, h_j = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    seq_k, h_k = keras_lstm(params, x, lengths)
    # compare sequence outputs only at valid steps (masked-step conventions
    # differ: keras zeroes, we carry through — neither is ever consumed)
    for b in range(x.shape[0]):
        n = lengths[b]
        assert np.abs(np.asarray(seq_j)[b, :n] - seq_k[b, :n]).max() < GATE
    assert np.abs(np.asarray(h_j) - h_k).max() < GATE


def test_backward_lstm_matches_keras(seqs):
    from icl.eval.oracle import keras_lstm
    x, lengths = seqs
    m = LSTM(hidden=8, reverse=True)
    params = _init(m, x, lengths)
    seq_j, h_j = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    seq_k, h_k = keras_lstm(params, x, lengths, go_backwards=True)
    assert np.abs(np.asarray(h_j) - h_k).max() < GATE
    for b in range(x.shape[0]):
        n = lengths[b]
        assert np.abs(np.asarray(seq_j)[b, :n] - seq_k[b, :n]).max() < GATE


def test_bilstm_concat_order(seqs):
    from icl.eval.oracle import oracle_bilstm
    x, lengths = seqs
    m = BiLSTM(hidden=6)
    params = _init(m, x, lengths)
    seq_j, h_j = m.apply({"params": params}, jnp.asarray(x), jnp.asarray(lengths))
    seq_k, h_k = oracle_bilstm(params, x, lengths)
    assert np.abs(np.asarray(h_j) - h_k).max() < GATE
    for b in range(x.shape[0]):
        n = lengths[b]
        assert np.abs(np.asarray(seq_j)[b, :n] - seq_k[b, :n]).max() < GATE


def test_forget_bias_init(seqs):
    x, lengths = seqs
    m = LSTM(hidden=8)
    params = _init(m, x, lengths)
    b = params["bias"]
    assert (b[8:16] == 1.0).all() and (b[:8] == 0.0).all() and (b[16:] == 0.0).all()
