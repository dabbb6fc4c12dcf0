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
    unroll: int = 1   # scan unroll knob (measured neutral-to-negative on v5e)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, L, D = x.shape
        H = self.hidden
        kernel = self.param("kernel", nn.initializers.glorot_uniform(), (D, 4 * H))
        recurrent = self.param("recurrent_kernel", nn.initializers.orthogonal(), (H, 4 * H))
        bias = self.param("bias", _keras_lstm_bias_init, (4 * H,))

        cd = self.compute_dtype
        xs = x.astype(cd)
        rec = recurrent.astype(cd)

        t_idx = jnp.arange(L, dtype=jnp.int32)
        if self.reverse:
            xs = xs[:, ::-1]
            # row t of the reversed sequence is original position L-1-t
            step_mask = (L - 1 - t_idx)[:, None] < lengths[None, :].astype(jnp.int32)
        else:
            step_mask = t_idx[:, None] < lengths[None, :].astype(jnp.int32)

        # hoist the input projection out of the recurrence: one [B·L, D] @
        # [D, 4H] MXU GEMM up front; the scan carries only the h @ U matmul
        # (cuDNN-style split — identical math, far better MXU utilization)
        x_proj = (xs.reshape(B * L, D) @ kernel.astype(cd)
                  + bias.astype(cd)).reshape(B, L, 4 * H)
        xs_t = jnp.swapaxes(x_proj, 0, 1)          # [L, B, 4H]

        def step(carry, inp):
            h_prev, c_prev = carry
            zx_t, m_t = inp                         # [B, 4H], [B]
            z = zx_t + h_prev @ rec
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
        (h_final, _), hs = jax.lax.scan(step, init, (xs_t, step_mask),
                                        unroll=self.unroll)
        outputs = jnp.swapaxes(hs, 0, 1)            # [B, L, H]
        if self.reverse:
            outputs = outputs[:, ::-1]
        return outputs.astype(jnp.float32), h_final.astype(jnp.float32)


class _LSTMParams(nn.Module):
    """Raw LSTM parameter declaration with icl.models.rnn.LSTM's exact tree
    layout and initializers — lets BiLSTM run a direction-stacked scan while
    staying checkpoint/oracle-compatible with two separate LSTM children."""

    in_dim: int
    hidden: int

    @nn.compact
    def __call__(self):
        k = self.param("kernel", nn.initializers.glorot_uniform(),
                       (self.in_dim, 4 * self.hidden))
        r = self.param("recurrent_kernel", nn.initializers.orthogonal(),
                       (self.hidden, 4 * self.hidden))
        b = self.param("bias", _keras_lstm_bias_init, (4 * self.hidden,))
        return k, r, b


class BiLSTM(nn.Module):
    """Bidirectional LSTM: concat [fwd_h_t ; bwd_h_t] per position → [B,L,2H].

    bwd_h_t encodes tokens t..length-1 (the backward scan starts at the last
    valid token), matching Keras ``Bidirectional(LSTM, merge_mode='concat')``.

    TPU-native: both directions run in ONE ``lax.scan`` — inputs, masks and
    weights are stacked on a leading direction axis (the backward copy is
    time-reversed), so the sequential chain is L steps of a 2-group batched
    GEMM instead of 2·L steps of half-size GEMMs.  Two independent scans
    would serialize on device; this halves the recurrent critical path.
    """

    hidden: int
    compute_dtype: jnp.dtype = jnp.float32
    unroll: int = 1   # scan unroll knob (measured neutral-to-negative on v5e)
    use_kernel: bool = False   # Pallas recurrence kernel (inference, TPU)

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        import jax as _jax

        B, L, D = x.shape
        H = self.hidden
        kf, rf, bf = _LSTMParams(D, H, name="fwd")()
        kb, rb, bb = _LSTMParams(D, H, name="bwd")()

        if self.use_kernel and _jax.devices()[0].platform == "tpu":
            from icl.ops.lstm_kernel import bilstm_apply_pallas

            params = {"fwd": {"kernel": kf, "recurrent_kernel": rf, "bias": bf},
                      "bwd": {"kernel": kb, "recurrent_kernel": rb, "bias": bb}}
            return bilstm_apply_pallas(x, lengths, params, hidden=H)

        cd = self.compute_dtype

        xs = x.astype(cd)
        xs2 = jnp.stack([xs, xs[:, ::-1]])                     # [2,B,L,D]
        K2 = jnp.stack([kf, kb]).astype(cd)                    # [2,D,4H]
        R2 = jnp.stack([rf, rb]).astype(cd)                    # [2,H,4H]
        b2 = jnp.stack([bf, bb]).astype(cd)                    # [2,4H]

        t_idx = jnp.arange(L, dtype=jnp.int32)
        len_i = lengths.astype(jnp.int32)[None, :]
        mask_f = t_idx[:, None] < len_i                        # [L,B]
        mask_b = (L - 1 - t_idx)[:, None] < len_i
        mask2 = jnp.stack([mask_f, mask_b], axis=1)            # [L,2,B]

        # input projection for both directions in one batched GEMM
        x_proj = (jnp.einsum("gbld,gdh->gblh", xs2, K2)
                  + b2[:, None, None, :])                      # [2,B,L,4H]
        xs_t = jnp.transpose(x_proj, (2, 0, 1, 3))             # [L,2,B,4H]

        def step(carry, inp):
            h_prev, c_prev = carry                             # [2,B,H]
            zx_t, m_t = inp                                    # [2,B,4H],[2,B]
            z = zx_t + jnp.einsum("gbh,ghk->gbk", h_prev, R2)
            i = jax.nn.sigmoid(z[..., :H])
            f = jax.nn.sigmoid(z[..., H:2 * H])
            g = jnp.tanh(z[..., 2 * H:3 * H])
            o = jax.nn.sigmoid(z[..., 3 * H:])
            c = f * c_prev + i * g
            h = o * jnp.tanh(c)
            m = m_t[..., None].astype(cd)
            h = m * h + (1 - m) * h_prev
            c = m * c + (1 - m) * c_prev
            return (h, c), h

        init = (jnp.zeros((2, B, H), cd), jnp.zeros((2, B, H), cd))
        (h_final, _), hs = jax.lax.scan(step, init, (xs_t, mask2),
                                        unroll=self.unroll)
        fwd_seq = jnp.transpose(hs[:, 0], (1, 0, 2))           # [B,L,H]
        bwd_seq = jnp.transpose(hs[:, 1], (1, 0, 2))[:, ::-1]
        seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1).astype(jnp.float32)
        fin = jnp.concatenate([h_final[0], h_final[1]], axis=-1)
        return seq, fin.astype(jnp.float32)
