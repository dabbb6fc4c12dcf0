"""Fused bilinear-grid head — the Pallas kernel behind K1 and K2 (layer L0).

Reference parity: BASELINE.json north_star names two kernel targets: the
O(mentions²) pairwise feature construction (K1) and the batched affinity
GEMM+softmax (K2).  Both reduce to one primitive, because concatenation into
a Dense layer distributes over the weight::

    relu([x_a ; y_b] @ W1 + b1) @ W2 + b2
      == relu((x_a @ W1_top) + (y_b @ W1_bot) + b1) @ W2 + b2
      == relu(X[a] + Y[b] + b1) @ W2 + b2        with X/Y projected ONCE

* K1 (relation): X = Y = mention reps projected by the head Dense —
  projecting M mentions instead of M(M-1)/2 pairs cuts the dominant GEMM
  FLOPs by ~M×; the [a,b] grid is every ordered mention pair.
* K2 (affinity): X = phrase projections, Y = fc7 box projections; the
  [m, b] grid is every (mention, box) cell.

The kernel computes ``out[g,a,b,:] = act(X[g,a] + Y[g,b] + b1) @ W2 + b2``
tile-by-tile in VMEM: the [Ta, Tb, K] activation exists only on-chip, never
in HBM (the XLA fallback materializes the [G,A,B,K] tensor — at K=1024 that
is the dominant HBM traffic of the whole model).  Grid iteration order is
(g, a-tile, b-tile) with X/Y blocks revisited; W2/b1/b2 are replicated to
every program instance.

The XLA-composed :func:`grid_head_reference` is the permanent correctness
oracle (SURVEY §9.1 step 6: kernels are an optimization layer, never a
correctness dependency).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def grid_head_reference(X: jnp.ndarray, Y: jnp.ndarray, b1: jnp.ndarray,
                        W2: jnp.ndarray, b2: jnp.ndarray) -> jnp.ndarray:
    """XLA oracle: [G,A,K],[G,B,K] → [G,A,B,O] via materialized grid."""
    h = jax.nn.relu(X[:, :, None, :] + Y[:, None, :, :] + b1)
    return jnp.einsum("gabk,ko->gabo", h, W2) + b2


def _kernel(x_ref, y_ref, w2_ref, b2_ref, out_ref, *, fast_dot):
    # blocks: x [1,Ta,K] (b1 pre-folded by the wrapper) y [1,Tb,K]
    #         w2 [K,O] b2 [O] out [1,Ta,Tb,O]
    x = x_ref[0]                                  # [Ta, K]
    y = y_ref[0]                                  # [Tb, K]
    Ta, K = x.shape
    Tb = y.shape[0]
    h = jnp.maximum(x[:, None, :] + y[None, :, :], 0.0).reshape(Ta * Tb, K)
    if fast_dot:                 # bf16 throughput mode: one-pass MXU dot
        h, w2 = h.astype(jnp.bfloat16), w2_ref[:].astype(jnp.bfloat16)
        # pin DEFAULT: an inherited session 'high' reaches Mosaic as an
        # unsupported dot precision (it only accepts DEFAULT/HIGHEST)
        out = jnp.dot(h, w2, preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.DEFAULT)
    else:
        out = jnp.dot(h, w2_ref[:], preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST)
    out_ref[0] = (out + b2_ref[:]).reshape(Ta, Tb, -1)


def _flat_kernel(x_ref, y_ref, w2_ref, b2_ref, out_ref, *, tg, fast_dot):
    """Single-tile-per-image variant emitting TRANSPOSED [O, A·B] logits.

    Two wins over the tiled kernel (mirrors grid_head_train's flat loss
    path): the head dot contracts K deep with a fully-laned [O, N] output
    instead of an O-minor [N, O] one (which wastes 124/128 MXU output
    lanes at O=4), and the + b2 broadcast runs on ~2 vregs instead of
    ~N/8 quarter-empty ones.  The wrapper untransposes in XLA (a cheap
    [G,O,A,B] → [G,A,B,O] copy) to keep the public contract.

    ``tg`` images per program (python-unrolled) amortize the per-program
    grid overhead at small image tiles — G=128 single-image programs pay
    ~1 µs each while the actual tile work is a fraction of that.
    """
    for t in range(tg):
        x = x_ref[t]                              # [Ap, K] (b1 folded)
        y = y_ref[t]                              # [Bp, K]
        Ta, K = x.shape
        Tb = y.shape[0]
        h = jnp.maximum(x[:, None, :] + y[None, :, :], 0.0)
        h = h.reshape(Ta * Tb, K)
        w2 = w2_ref[:]
        if fast_dot:             # bf16 throughput mode: one-pass MXU dot
            # the elementwise add/relu stays f32 (negative result #3:
            # packed-bf16 cmpf won't lower); only the dot operands drop to
            # bf16 — the same policy the TRAIN kernel's dots follow at
            # 'default' session precision
            h, w2 = h.astype(jnp.bfloat16), w2.astype(jnp.bfloat16)
            # pin DEFAULT: an inherited session 'high' reaches Mosaic
            # as an unsupported dot precision
            prec = jax.lax.Precision.DEFAULT
        else:
            prec = jax.lax.Precision.HIGHEST
        out_t = jax.lax.dot_general(              # W2ᵀ · hdᵀ : [O, N]
            w2, h,
            dimension_numbers=(((0,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=prec)
        out_ref[t] = out_t + b2_ref[:][:, None]


@functools.partial(jax.jit,
                   static_argnames=("block_a", "block_b", "fast_dot"))
def grid_head_pallas(X: jnp.ndarray, Y: jnp.ndarray, b1: jnp.ndarray,
                     W2: jnp.ndarray, b2: jnp.ndarray,
                     block_a: int = 8, block_b: int = 128,
                     fast_dot: bool = False) -> jnp.ndarray:
    """Pallas TPU kernel; same contract as :func:`grid_head_reference`.

    Tile sizes keep the on-chip [Ta, Tb, K] activation ≤ ~4 MB at K=1024
    (VMEM is ~16 MB/core); A/B are padded up to tile multiples and cropped
    after (pad rows produce garbage that is sliced away — cheaper than
    masking inside the kernel).
    """
    G, A, K = X.shape
    B = Y.shape[1]
    O = W2.shape[1]
    if G == 0 or A == 0 or B == 0:
        # same contract as grid_head_reference (empty grid, no kernel) —
        # a zero tile dim would divide by zero in the padding math
        return jnp.zeros((G, A, B, O), jnp.float32)
    # sublane-dim tiles need only 8-multiples; rounding small A/B up to the
    # full block would pad 16-mention grids to 128 rows (8x wasted work)
    Ta = min(block_a, _round_up(A, 8))
    Tb = min(block_b, _round_up(B, 8))
    Ap, Bp = _round_up(A, Ta), _round_up(B, Tb)
    # fold b1 into X: one [G,A,K] add replaces a per-cell add in-kernel
    Xp = jnp.pad(X + b1, ((0, 0), (0, Ap - A), (0, 0)))
    Yp = jnp.pad(Y, ((0, 0), (0, Bp - B), (0, 0)))

    # single-tile-per-image fast path (the production Flickr30k shape):
    # whole [Ap,Bp,K] activation fits VMEM → transposed-output kernel
    if Ap * Bp * K * 4 <= 4 * 1024 * 1024:
        N = Ap * Bp
        # largest image-group whose x/y blocks stay comfortably in VMEM
        tg = 1
        for cand in (8, 4, 2):
            if G % cand == 0 and cand * (Ap + Bp) * K * 4 <= 2 * 1024 * 1024:
                tg = cand
                break
        out_t = pl.pallas_call(
            functools.partial(_flat_kernel, tg=tg, fast_dot=fast_dot),
            out_shape=jax.ShapeDtypeStruct((G, O, N), jnp.float32),
            grid=(G // tg,),
            in_specs=[
                pl.BlockSpec((tg, Ap, K), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tg, Bp, K), lambda g: (g, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((K, O), lambda g: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((O,), lambda g: (0,),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((tg, O, N), lambda g: (g, 0, 0),
                                   memory_space=pltpu.VMEM),
            cost_estimate=pl.CostEstimate(
                flops=2 * G * N * K * O + G * N * K * 2,
                bytes_accessed=4 * (G * Ap * K + G * Bp * K + K * O
                                    + G * N * O),
                transcendentals=0,
            ),
        )(Xp, Yp, W2, b2)
        out = jnp.transpose(out_t.reshape(G, O, Ap, Bp), (0, 2, 3, 1))
        return out[:, :A, :B, :]

    out = pl.pallas_call(
        functools.partial(_kernel, fast_dot=fast_dot),
        out_shape=jax.ShapeDtypeStruct((G, Ap, Bp, O), jnp.float32),
        grid=(G, Ap // Ta, Bp // Tb),
        in_specs=[
            pl.BlockSpec((1, Ta, K), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Tb, K), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K, O), lambda g, i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((O,), lambda g, i, j: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ta, Tb, O), lambda g, i, j: (g, i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Ap * Bp * K * O + G * Ap * Bp * K * 3,
            bytes_accessed=4 * (G * Ap * K + G * Bp * K + K * O
                                + G * Ap * Bp * O),
            transcendentals=0,
        ),
    )(Xp, Yp, W2, b2)
    return out[:, :A, :B, :]


def fused_grid_head(X, Y, b1, W2, b2, use_pallas: bool | None = None,
                    fast_dot: bool = False):
    """Dispatch: Pallas on TPU, XLA oracle elsewhere (or when forced).

    ``fast_dot`` (bf16 throughput mode only): the kernel head dot runs
    one-pass bf16 instead of pinned 'highest' — the same policy the
    TRAIN kernel follows at 'default' session precision.  The XLA
    oracle ignores it (it is the f32 correctness reference; bf16 mode
    is documented as non-parity-grade, BENCHMARKS.md).
    """
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        return grid_head_pallas(X, Y, b1, W2, b2, fast_dot=fast_dot)
    return grid_head_reference(X, Y, b1, W2, b2)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m
