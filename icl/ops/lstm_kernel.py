"""Pallas BiLSTM recurrence kernel — the framework's hottest op (layer L0).

Reference parity: the BiLSTM caption encoder carries ~75% of the relation
model's FLOPs and 100% of its sequential critical path (SURVEY §6.4).  The
XLA `lax.scan` formulation (icl.models.rnn.BiLSTM) pays per-step loop
overhead (dynamic-update-slice of outputs, loop bookkeeping) that dominates
when the per-step GEMM is small ([B,200]@[200,800]).  This kernel runs the
ENTIRE recurrence for a batch tile inside one program: the recurrent weights
live in VMEM for all L steps, each step is one MXU matmul + VPU gates, and
sequence outputs are written straight to the output block.

Layout: time-major with L on a LEADING (untiled) axis so the per-step
dynamic index never touches the tiled sublane/lane dims:

    x_proj  [2, L, B, 4H]   (input projection precomputed by XLA — one big
                             GEMM; direction 1 is time-reversed)
    mask    [2, L, B, 1]    int32 validity per (direction, step, row)
    R       [2, H, 4H]      recurrent kernels
    out     [2, L, B, H]    hidden state at every step

Semantics identical to icl.models.rnn.BiLSTM (Keras gate order, carry-
through masking); equality is tested in interpret mode and on real TPU
(bit-exact at Tb=32).

**Measured outcome (v5e, B=640, L=32, H=200): the XLA scan wins.**
scan 0.58 ms/call (~56 TFLOPS f32, near compute-bound — full-batch
[B,H]@[H,4H] GEMMs per step) vs this kernel 0.99 ms: VMEM caps the batch
tile at 32 rows (quarter-MXU GEMMs) and the single TensorCore runs grid
programs sequentially, so tiling the batch *lengthens* the sequential
chain.  Kept as a correctness-verified alternative and a record of the
negative result; production paths (BiLSTM default, RelationModel.fused)
use the scan.  A future DMA-double-buffered full-batch variant could
stream x_proj from HBM step-by-step, but the ≤30% theoretical headroom
does not justify it yet.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icl.ops.grid_head import _round_up


def _lstm_kernel(xp_ref, mask_ref, r_ref, out_ref, *, hidden: int, length: int):
    # blocks: xp [1, L, Tb, 4H] mask [1, L, Tb, 1] r [1, H, 4H]
    #         out [1, L, Tb, H]
    H = hidden
    Tb = xp_ref.shape[2]
    R = r_ref[0]                                    # [H, 4H]

    def step(t, carry):
        h_prev, c_prev = carry
        z = xp_ref[0, t] + jnp.dot(h_prev, R,
                                   preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
        i = jax.nn.sigmoid(z[:, :H])
        f = jax.nn.sigmoid(z[:, H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = jax.nn.sigmoid(z[:, 3 * H:])
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        m = mask_ref[0, t].astype(jnp.float32)          # [Tb, 1]
        h = m * h + (1 - m) * h_prev
        c = m * c + (1 - m) * c_prev
        out_ref[0, t] = h
        return h, c

    init = (jnp.zeros((Tb, H), jnp.float32), jnp.zeros((Tb, H), jnp.float32))
    jax.lax.fori_loop(0, length, step, init)


@functools.partial(jax.jit, static_argnames=("hidden", "block_b"))
def bilstm_recurrence_pallas(x_proj2: jnp.ndarray, mask2: jnp.ndarray,
                             R2: jnp.ndarray, hidden: int,
                             block_b: int = 32) -> jnp.ndarray:
    """[2,L,B,4H] x_proj + [2,L,B] mask + [2,H,4H] R → [2,L,B,H] states."""
    two, L, B, fourH = x_proj2.shape
    H = hidden
    Tb = min(block_b, _round_up(B, 8))
    Bp = _round_up(B, Tb)
    xp = jnp.pad(x_proj2, ((0, 0), (0, 0), (0, Bp - B), (0, 0)))
    # lane dim of size 1 is always block-legal; sublane (B) tiles at Tb
    mp = jnp.pad(mask2.astype(jnp.int32),
                 ((0, 0), (0, 0), (0, Bp - B)))[:, :, :, None]  # [2,L,Bp,1]

    out = pl.pallas_call(
        functools.partial(_lstm_kernel, hidden=H, length=L),
        out_shape=jax.ShapeDtypeStruct((2, L, Bp, H), jnp.float32),
        grid=(2, Bp // Tb),
        in_specs=[
            pl.BlockSpec((1, L, Tb, fourH), lambda g, b: (g, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, L, Tb, 1), lambda g, b: (g, 0, b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, fourH), lambda g, b: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, L, Tb, H), lambda g, b: (g, 0, b, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * L * H * 4 * H,
            bytes_accessed=4 * (2 * L * Bp * (4 * H + H) + 2 * H * 4 * H),
            transcendentals=2 * Bp * L * 4 * H,
        ),
    )(xp, mp, R2)
    return out[:, :, :B, :]


def bilstm_apply_pallas(x: jnp.ndarray, lengths: jnp.ndarray,
                        params: dict, hidden: int,
                        block_b: int = 32):
    """Full BiLSTM forward via the kernel; mirrors icl.models.rnn.BiLSTM.

    params: {"fwd": {...}, "bwd": {...}} with kernel/recurrent_kernel/bias.
    Returns (seq [B,L,2H], final [B,2H]).
    """
    B, L, D = x.shape
    kf, kb = params["fwd"]["kernel"], params["bwd"]["kernel"]
    rf, rb = params["fwd"]["recurrent_kernel"], params["bwd"]["recurrent_kernel"]
    bf, bb = params["fwd"]["bias"], params["bwd"]["bias"]

    xs2 = jnp.stack([x, x[:, ::-1]])                          # [2,B,L,D]
    K2 = jnp.stack([kf, kb])
    R2 = jnp.stack([rf, rb])
    b2 = jnp.stack([bf, bb])
    x_proj = (jnp.einsum("gbld,gdh->gblh", xs2, K2)
              + b2[:, None, None, :])                         # [2,B,L,4H]
    x_proj = jnp.transpose(x_proj, (0, 2, 1, 3))              # [2,L,B,4H]

    t_idx = jnp.arange(L, dtype=jnp.int32)
    len_i = lengths.astype(jnp.int32)[None, :]
    mask_f = t_idx[:, None] < len_i                           # [L,B]
    mask_b = (L - 1 - t_idx)[:, None] < len_i
    mask2 = jnp.stack([mask_f, mask_b])                       # [2,L,B]

    hs = bilstm_recurrence_pallas(x_proj, mask2, R2, hidden,
                                  block_b=block_b)            # [2,L,B,H]
    fwd_seq = jnp.transpose(hs[0], (1, 0, 2))                 # [B,L,H]
    bwd_seq = jnp.transpose(hs[1], (1, 0, 2))[:, ::-1]
    seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1)
    # final = state at the last valid step == carry-through at t = L-1
    final = jnp.concatenate([hs[0, L - 1], hs[1, L - 1]], axis=-1)
    return seq, final
