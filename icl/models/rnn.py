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
bfloat16 compute path for throughput (`compute_dtype`).  Outputs come back
in ``compute_dtype``: converting the full [B,L,2H] sequence to f32 before
the (tiny) mention/final-state gathers cost a measured 0.2 ms/step of pure
convert traffic — consumers gather first and promote after.
"""

from __future__ import annotations

import functools

import numpy as np

import flax.linen as nn
import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def lstm_recurrence(x_proj, R2, mask2, unroll: int = 1):
    """Masked LSTM recurrence over pre-projected inputs, custom backward.

    Args: x_proj [L,G,B,4H] (input projection + bias, gate order i,f,c̃,o),
    R2 [G,H,4H] recurrent kernels, mask2 [L,G,B] step validity; G stacks
    independent directions/groups.  Returns (hs [L,G,B,H], h_final [G,B,H]).

    Why custom: XLA's scan transpose accumulates dR and recomputes the gate
    nonlinearities INSIDE the sequential backward loop — L serialized
    small GEMMs each for dgates@Rᵀ and h_prevᵀ@dgates.  This VJP saves the
    gate activations + cell sequence from the forward (the cuDNN-style
    residual set), keeps only the irreducible dgates@Rᵀ chain in the
    reverse scan, and hoists dR into ONE [G·H, L·B]×[L·B, 4H]-shaped GEMM
    afterwards; dW/dx/db fall out of the x_proj GEMM's own (non-custom)
    backward as single large GEMMs.  Forward math is IDENTICAL to the
    plain scan (same primitives, same order) — parity gates unaffected.
    """
    (hs, h_final), _ = _lstm_recurrence_fwd_impl(x_proj, R2, mask2, unroll)
    return hs, h_final


def _lstm_recurrence_fwd_impl(x_proj, R2, mask2, unroll):
    H = R2.shape[1]
    cd = x_proj.dtype
    G, B = x_proj.shape[1], x_proj.shape[2]

    def step(carry, inp):
        h_prev, c_prev = carry
        zx_t, m_t = inp                                # [G,B,4H], [G,B]
        z = zx_t + jnp.einsum("gbh,ghk->gbk", h_prev, R2)
        i = jax.nn.sigmoid(z[..., :H])
        f = jax.nn.sigmoid(z[..., H:2 * H])
        g = jnp.tanh(z[..., 2 * H:3 * H])
        o = jax.nn.sigmoid(z[..., 3 * H:])
        c_t = f * c_prev + i * g
        h_t = o * jnp.tanh(c_t)
        m = m_t[..., None].astype(cd)
        h = m * h_t + (1 - m) * h_prev                 # Keras mask: carry
        c = m * c_t + (1 - m) * c_prev
        gates = jnp.concatenate([i, f, g, o], axis=-1)
        return (h, c), (h, gates, c)

    init = (jnp.zeros((G, B, H), cd), jnp.zeros((G, B, H), cd))
    (h_final, _), (hs, gates_seq, c_seq) = jax.lax.scan(
        step, init, (x_proj, mask2), unroll=unroll)
    return (hs, h_final), (gates_seq, c_seq, hs, R2, mask2)


def _lstm_recurrence_bwd_impl(unroll, res, cots):
    gates_seq, c_seq, hs, R2, mask2 = res
    dhs, dhf = cots
    H = R2.shape[1]
    cd = gates_seq.dtype
    dhs = dhs.astype(cd)
    # post-mask c/h sequences shifted by one step are the true prev states
    # (mask pass-through makes the stored value the carried value)
    c_prev_seq = jnp.concatenate([jnp.zeros_like(c_seq[:1]), c_seq[:-1]], 0)
    h_prev_seq = jnp.concatenate([jnp.zeros_like(hs[:1]), hs[:-1]], 0)

    def bstep(carry, inp):
        dh, dc = carry
        dh_out, gates, c, c_prev, m_t = inp
        dh = dh + dh_out
        m = m_t[..., None].astype(cd)
        i = gates[..., :H]
        f = gates[..., H:2 * H]
        g = gates[..., 2 * H:3 * H]
        o = gates[..., 3 * H:]
        tc = jnp.tanh(c)            # == tanh(c̃) wherever m == 1
        dh_t = dh * m
        dc_t = dc * m + dh_t * o * (1 - tc * tc)
        do = dh_t * tc * o * (1 - o)
        df = dc_t * c_prev * f * (1 - f)
        di = dc_t * g * i * (1 - i)
        dg = dc_t * i * (1 - g * g)
        dgates = jnp.concatenate([di, df, dg, do], axis=-1)
        dh_prev = (jnp.einsum("gbk,ghk->gbh", dgates, R2)
                   + dh * (1 - m))
        dc_prev = dc_t * f + dc * (1 - m)
        return (dh_prev, dc_prev), dgates

    init = (dhf.astype(cd), jnp.zeros_like(dhf, dtype=cd))
    _, dgates_seq = jax.lax.scan(
        bstep, init, (dhs, gates_seq, c_seq, c_prev_seq, mask2),
        reverse=True, unroll=unroll)
    # ONE big GEMM instead of L in-loop accumulations
    dR2 = jnp.einsum("lgbh,lgbk->ghk", h_prev_seq, dgates_seq)
    dmask = np.zeros(mask2.shape, jax.dtypes.float0)
    return dgates_seq, dR2, dmask


lstm_recurrence.defvjp(
    lambda x_proj, R2, mask2, unroll:
        _lstm_recurrence_fwd_impl(x_proj, R2, mask2, unroll),
    _lstm_recurrence_bwd_impl)


def _keras_lstm_bias_init(key, shape, dtype=jnp.float32):
    """zeros with the forget-gate slab (2nd quarter) set to 1."""
    del key
    h = shape[0] // 4
    b = jnp.zeros(shape, dtype)
    return b.at[h:2 * h].set(1.0)


class LSTM(nn.Module):
    """Unidirectional masked LSTM over [B, L, D] returning (outputs, final_h).

    outputs: [B, L, H] hidden state at every step.  At padded steps the
    carry passes through unchanged (Keras masking), so positions ≥ length
    hold the LAST VALID state, not zeros — consumers must mask or gather
    at positions < length (gathering at any t < length yields the encoding
    of tokens ≤ t).
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

        # single-direction group (G=1) through the shared custom-VJP
        # recurrence (see lstm_recurrence: big-GEMM backward)
        hs, h_final = lstm_recurrence(xs_t[:, None], rec[None],
                                      step_mask[:, None], self.unroll)
        hs, h_final = hs[:, 0], h_final[0]
        outputs = jnp.swapaxes(hs, 0, 1)            # [B, L, H]
        if self.reverse:
            outputs = outputs[:, ::-1]
        return outputs, h_final


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
    use_kernel: bool = False   # r1 tiled Pallas recurrence (negative result)
    stream_kernel: bool = False  # r2 DMA-streaming recurrence (neg. result)
    # scan_form=True returns the recurrence ys buffer [L,2,B,H] untouched
    # (fwd at [t,0], bwd at [t,1] = original position L-1-t) instead of the
    # [B,L,2H] transpose/reverse/concat, letting consumers gather positions
    # straight from scan coordinates.  NEGATIVE RESULT #5 on v5e: the
    # relation model consuming this (gather_mention_reps_scan) traced
    # 2.21 ms/step vs 2.15 for the materializing path — the backward scan
    # absorbs the cotangent scatters and outgrows the relayout-copy
    # savings.  Kept (with a bit-identity test) as the measured record.
    scan_form: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        import jax as _jax

        B, L, D = x.shape
        H = self.hidden
        kf, rf, bf = _LSTMParams(D, H, name="fwd")()
        kb, rb, bb = _LSTMParams(D, H, name="bwd")()

        if ((self.use_kernel or self.stream_kernel)
                and _jax.devices()[0].platform == "tpu"):
            from icl.ops.lstm_kernel import (bilstm_apply_pallas,
                                             bilstm_apply_stream)

            params = {"fwd": {"kernel": kf, "recurrent_kernel": rf, "bias": bf},
                      "bwd": {"kernel": kb, "recurrent_kernel": rb, "bias": bb}}
            if self.stream_kernel:
                return bilstm_apply_stream(x, lengths, params, hidden=H,
                                           compute_dtype=self.compute_dtype)
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

        # both directions in one G=2 custom-VJP recurrence: one sequential
        # chain forward AND backward, dR/dW/dx as single big GEMMs
        hs, h_final = lstm_recurrence(xs_t, R2, mask2, self.unroll)
        fin = jnp.concatenate([h_final[0], h_final[1]], axis=-1)
        if self.scan_form:
            return hs, fin                                     # [L,2,B,H]
        fwd_seq = jnp.transpose(hs[:, 0], (1, 0, 2))           # [B,L,H]
        bwd_seq = jnp.transpose(hs[:, 1], (1, 0, 2))[:, ::-1]
        seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1)
        return seq, fin
