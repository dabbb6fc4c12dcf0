"""Pinned LSTM / BiLSTM modules — the single source of RNN semantics.

Reference parity: SURVEY.md §6.4/§9.3(1).  The reference's Keras-1/Theano
LSTMs are operationalized against the Keras-3 CPU oracle (SURVEY §7.3), so
this module pins Keras-3 ``layers.LSTM`` semantics exactly:

* fused kernels: ``kernel [D, 4H]``, ``recurrent_kernel [H, 4H]``,
  ``bias [4H]`` with gate slab order **i, f, c̃, o**;
* ``i,f,o = sigmoid``, ``c̃ = tanh``; ``c = f·c₋₁ + i·c̃``; ``h = o·tanh(c)``;
* ``unit_forget_bias``: the ``f`` slab of the bias initializes to 1;
* initializers: glorot_uniform kernel, orthogonal recurrent, zeros bias;
* Keras masking: at padded steps the carry passes through unchanged, so the
  final carry equals the state at the last *valid* step.

TPU-native design: time iteration is a ``jax.lax.scan`` whose step is one
fused ``[B, D+H] @ [D+H, 4H]`` MXU matmul (inputs and recurrent kernels are
concatenated once outside the scan); the sequence axis stays static per
bucket so XLA compiles one program per bucket shape.  Parameters and compute
run in float32 by default (parity gate ≤1e-5 vs the oracle) with an optional
bfloat16 compute path for throughput (`compute_dtype`).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def _keras_lstm_bias_init(key, shape, dtype=jnp.float32):
    """zeros with the forget-gate slab (2nd quarter) set to 1."""
    del key
    h = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[h:2 * h].set(1.0)


class LSTM(nn.Module):
    """Unidirectional masked LSTM over [B, L, D] returning (outputs, final_h).

    outputs: [B, L, H] hidden state at every step (zeros carried through at
    padded steps — the carry holds the last valid state, so gathering at any
    position t < length yields the encoding of tokens ≤ t).
    final_h: [B, H] hidden state at the last valid step of each row.
    """

    hidden: int
    reverse: bool = False
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, L, D = x.shape
        H = self.hidden
        kernel = self.param("kernel", nn.initializers.glorot_uniform(), (D, 4 * H))
        recurrent = self.param("recurrent_kernel", nn.initializers.orthogonal(), (H, 4 * H))
        bias = self.param("bias", _keras_lstm_bias_init, (4 * H,))

        cd = self.compute_dtype
        xs = x.astype(cd)
        # one fused weight so each scan step is a single MXU matmul
        w = jnp.concatenate([kernel, recurrent], axis=0).astype(cd)
        b = bias.astype(cd)

        t_idx = jnp.arange(L, dtype=jnp.int32)
        if self.reverse:
            xs = xs[:, ::-1]
            # row t of the reversed sequence is original position L-1-t
            step_mask = (L - 1 - t_idx)[:, None] < lengths[None, :].astype(jnp.int32)
        else:
            step_mask = t_idx[:, None] < lengths[None, :].astype(jnp.int32)

        xs_t = jnp.swapaxes(xs, 0, 1)              # [L, B, D]

        def step(carry, inp):
            h_prev, c_prev = carry
            x_t, m_t = inp                          # [B, D], [B]
            z = jnp.concatenate([x_t, h_prev], axis=-1) @ w + b
            i = jax.nn.sigmoid(z[:, :H])
            f = jax.nn.sigmoid(z[:, H:2 * H])
            g = jnp.tanh(z[:, 2 * H:3 * H])
            o = jax.nn.sigmoid(z[:, 3 * H:])
            c = f * c_prev + i * g
            h = o * jnp.tanh(c)
            m = m_t[:, None].astype(cd)
            h = m * h + (1 - m) * h_prev            # Keras mask: carry through
            c = m * c + (1 - m) * c_prev
            return (h, c), h

        init = (jnp.zeros((B, H), cd), jnp.zeros((B, H), cd))
        (h_final, _), hs = jax.lax.scan(step, init, (xs_t, step_mask))
        outputs = jnp.swapaxes(hs, 0, 1)            # [B, L, H]
        if self.reverse:
            outputs = outputs[:, ::-1]
        return outputs.astype(jnp.float32), h_final.astype(jnp.float32)


class BiLSTM(nn.Module):
    """Bidirectional LSTM: concat [fwd_h_t ; bwd_h_t] per position → [B,L,2H].

    bwd_h_t encodes tokens t..length-1 (the backward scan starts at the last
    valid token), matching Keras ``Bidirectional(LSTM, merge_mode='concat')``.
    """

    hidden: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        fwd_out, fwd_h = LSTM(self.hidden, reverse=False,
                              compute_dtype=self.compute_dtype, name="fwd")(x, lengths)
        bwd_out, bwd_h = LSTM(self.hidden, reverse=True,
                              compute_dtype=self.compute_dtype, name="bwd")(x, lengths)
        return jnp.concatenate([fwd_out, bwd_out], axis=-1), jnp.concatenate(
            [fwd_h, bwd_h], axis=-1)
