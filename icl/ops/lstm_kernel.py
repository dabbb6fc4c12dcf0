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

**Measured outcome #1 (v5e, B=640, L=32, H=200): the XLA scan wins.**
scan 0.58 ms/call (~56 TFLOPS f32, near compute-bound — full-batch
[B,H]@[H,4H] GEMMs per step) vs this kernel 0.99 ms: VMEM caps the batch
tile at 32 rows (quarter-MXU GEMMs) and the single TensorCore runs grid
programs sequentially, so tiling the batch *lengthens* the sequential
chain.

**Measured outcome #2 (round 2): the DMA-double-buffered full-batch
variant below (bilstm_stream_pallas) also loses.**  It is bit-exact vs
the scan and keeps VMEM independent of L (x_proj streamed in one step
ahead, h states streamed out one step behind), but at the bench shape
(B=640, L=32, H=200):
- per-direction grid programs (VMEM-feasible) doubled the sequential
  chain to 64 steps: full-model predict 6.39M pairs/s vs the scan's
  9.20M at the f32 'high' policy — a 31% loss, compounded by Mosaic
  offering only HIGHEST (6-pass) f32 dots where the scan runs 'high'
  (3-pass);
- the single-program both-directions variant that would restore the
  32-step chain needs ~17.5 MB of scoped VMEM (double-buffered
  [2,640,896] x-slots + step temporaries) against the 16 MB budget, and
  the bf16 flavor ~30 MB (Mosaic's bf16 `logistic` lowering miscompiles
  — 'vector.broadcast' f32→bf16 — and the tanh-built sigmoid workaround
  still leaves f32 dot outputs live);
so streaming cannot beat the scan at this shape on a single core.  Both
kernels stay as correctness-verified alternatives (tests/unit,
tests/tpu); every production path uses the scan.
"""

from __future__ import annotations

import functools

import numpy as np

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


# ---------------------------------------------------------------------------
# Round-2 attempt: DMA-double-buffered FULL-BATCH recurrence (the round-1
# docstring's named follow-up).  The Tb=32 cap above exists only because the
# whole [L, Tb, 4H] x_proj block must sit in VMEM; streaming x_proj one step
# ahead from HBM (and the outputs one step behind) lets a single program keep
# the ENTIRE batch per direction: full-width [B,H]@[H,4H] MXU steps with no
# grid serialization, DMA hidden behind the step's compute.
# ---------------------------------------------------------------------------

def _stream_kernel(mask_ref, r_ref, xp_ref, out_ref,
                   xbuf, obuf, in_sem, out_sem, *, hidden, length):
    # SINGLE program, both directions: one DMA + two back-to-back MXU dots
    # + one concatenated-VPU gate pass per step — the sequential chain stays
    # L steps long (per-direction programs would double it)
    H = hidden
    cd = xbuf.dtype
    Bp = xbuf.shape[2]
    Rf = r_ref[0]                             # [H, 4H]
    Rb = r_ref[1]

    def in_dma(t, slot):
        return pltpu.make_async_copy(xp_ref.at[:, t], xbuf.at[slot],
                                     in_sem.at[slot])

    def out_dma(t, slot):
        return pltpu.make_async_copy(obuf.at[slot], out_ref.at[:, t],
                                     out_sem.at[slot])

    in_dma(0, 0).start()
    prec = (jax.lax.Precision.HIGHEST if cd == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def step(t, carry):
        h_prev, c_prev = carry                # [2·Bp, H] stacked dirs
        slot = t % 2
        nxt = (t + 1) % 2

        @pl.when(t + 1 < length)
        def _():
            in_dma(t + 1, nxt).start()        # prefetch next step's x_proj

        in_dma(t, slot).wait()
        zf = jnp.dot(h_prev[:Bp], Rf,
                     preferred_element_type=jnp.float32, precision=prec)
        zb = jnp.dot(h_prev[Bp:], Rb,
                     preferred_element_type=jnp.float32, precision=prec)
        x2 = xbuf[slot]                       # [2, Bp, 4Hp]
        z = (jnp.concatenate([zf, zb], axis=0).astype(cd)
             + jnp.concatenate([x2[0], x2[1]], axis=0))

        def sig(v):
            # Mosaic's bf16 'logistic' lowering miscompiles
            # ('vector.broadcast' f32→bf16); tanh lowers fine, so build
            # sigmoid from it: σ(x) = (tanh(x/2)+1)/2
            if cd == jnp.float32:
                return jax.nn.sigmoid(v)
            half = jnp.asarray(0.5, cd)
            return (jnp.tanh(v * half) + jnp.asarray(1.0, cd)) * half

        i = sig(z[:, :H])
        f = sig(z[:, H:2 * H])
        g = jnp.tanh(z[:, 2 * H:3 * H])
        o = sig(z[:, 3 * H:4 * H])
        c = f * c_prev + i * g
        h = o * jnp.tanh(c)
        m2 = mask_ref[:, t]                   # [2, Bp, 1]
        m = jnp.concatenate([m2[0], m2[1]], axis=0).astype(cd)
        h = m * h + (1 - m) * h_prev
        c = m * c + (1 - m) * c_prev

        # stream h out, double-buffered: slot's previous DMA was step t-2
        @pl.when(t >= 2)
        def _():
            out_dma(t - 2, slot).wait()
        # obuf/out carry Hp (128-aligned) lanes; the pad region is cropped
        # by the caller, so it may hold stale garbage
        obuf[slot, 0, :, :H] = h[:Bp]
        obuf[slot, 1, :, :H] = h[Bp:]
        out_dma(t, slot).start()
        return h, c

    init = (jnp.zeros((2 * Bp, H), cd), jnp.zeros((2 * Bp, H), cd))
    jax.lax.fori_loop(0, length, step, init)
    # drain the out pipeline (the last two steps' DMAs are in flight);
    # the final carry needs no output of its own: Keras carry-through
    # masking makes out[:, L-1] the state at each row's last valid step
    for t in range(max(length - 2, 0), length):
        out_dma(t, t % 2).wait()


@functools.partial(jax.jit, static_argnames=("hidden",))
def bilstm_stream_pallas(x_proj2: jnp.ndarray, mask2: jnp.ndarray,
                         R2: jnp.ndarray, hidden: int):
    """Streaming full-batch recurrence: [2,L,B,4H] → ([2,L,B,H], [2,B,H]).

    x_proj stays in HBM and is DMA'd per step (double-buffered); outputs
    stream back one step behind.  VMEM holds only 2 x-slots + 2 out-slots +
    carries + R — independent of L, so the batch is never tiled.
    """
    two, L, B, fourH = x_proj2.shape
    H = hidden
    cd = x_proj2.dtype
    Bp = _round_up(B, 8)
    # sliced DMAs (xp_ref.at[d, t], out_ref.at[d, t]) require 128-aligned
    # minor dims — pad 4H→4Hp and carry Hp output lanes, cropped below
    fourHp = _round_up(fourH, 128)
    Hp = _round_up(H, 128)
    xp = jnp.pad(x_proj2, ((0, 0), (0, 0), (0, Bp - B),
                           (0, fourHp - fourH)))
    R2 = jnp.pad(R2, ((0, 0), (0, 0), (0, fourHp - fourH)))
    mp = jnp.pad(mask2.astype(jnp.int32),
                 ((0, 0), (0, 0), (0, Bp - B)))[:, :, :, None]

    out = pl.pallas_call(
        functools.partial(_stream_kernel, hidden=H, length=L),
        out_shape=jax.ShapeDtypeStruct((2, L, Bp, Hp), cd),
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # mask [2,L,Bp,1]
            pl.BlockSpec(memory_space=pltpu.VMEM),        # R2 [2,H,4H]
            pl.BlockSpec(memory_space=pl.ANY),         # x_proj (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),   # out (HBM, DMA'd)
        scratch_shapes=[
            pltpu.VMEM((2, 2, Bp, fourHp), cd),           # x 2-slot, 2-dir
            pltpu.VMEM((2, 2, Bp, Hp), cd),               # out 2-slot, 2-dir
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * Bp * L * H * 4 * H,
            bytes_accessed=(np.dtype(cd).itemsize
                            * (2 * L * Bp * (4 * H + H) + 2 * H * 4 * H)),
            transcendentals=2 * Bp * L * 4 * H,
        ),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=jax.devices()[0].platform != "tpu",
    )(mp, R2, xp)
    out = out[:, :, :B, :H]
    return out, out[:, L - 1]


def bilstm_apply_stream(x: jnp.ndarray, lengths: jnp.ndarray,
                        params: dict, hidden: int,
                        compute_dtype=jnp.float32):
    """Full BiLSTM forward via the streaming kernel (API of BiLSTM.apply)."""
    B, L, D = x.shape
    K2 = jnp.stack([params["fwd"]["kernel"],
                    params["bwd"]["kernel"]]).astype(compute_dtype)
    R2 = jnp.stack([params["fwd"]["recurrent_kernel"],
                    params["bwd"]["recurrent_kernel"]]).astype(compute_dtype)
    b2 = jnp.stack([params["fwd"]["bias"],
                    params["bwd"]["bias"]]).astype(compute_dtype)
    xs2 = jnp.stack([x, x[:, ::-1]]).astype(compute_dtype)
    x_proj = (jnp.einsum("gbld,gdh->gblh", xs2, K2)
              + b2[:, None, None, :])
    x_proj = jnp.transpose(x_proj, (0, 2, 1, 3))              # [2,L,B,4H]

    t_idx = jnp.arange(L, dtype=jnp.int32)
    len_i = lengths.astype(jnp.int32)[None, :]
    mask2 = jnp.stack([t_idx[:, None] < len_i,
                       (L - 1 - t_idx)[:, None] < len_i])     # [2,L,B]

    hs, fin = bilstm_stream_pallas(x_proj, mask2, R2, hidden)
    fwd_seq = jnp.transpose(hs[0], (1, 0, 2))
    bwd_seq = jnp.transpose(hs[1], (1, 0, 2))[:, ::-1]
    seq = jnp.concatenate([fwd_seq, bwd_seq], axis=-1).astype(jnp.float32)
    final = jnp.concatenate([fin[0], fin[1]], axis=-1).astype(jnp.float32)
    return seq, final
