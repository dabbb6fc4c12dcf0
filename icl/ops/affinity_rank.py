"""K2 second stage: fused affinity GEMM + per-image masked ranking softmax.

Reference parity: BASELINE.json north_star — "the batched affinity
GEMM+softmax fused into Pallas kernels"; SURVEY §6.5's inference extra
("per-image softmax over candidate boxes for ranking").

For each (image g, mention a): rank over that image's candidate boxes

    s[g,a,b]    = (relu(X[g,a] + Y[g,b] + b1) @ W2 + b2)[affinity_col]
    rank[g,a,:] = softmax_b(s[g,a,:])  masked to valid boxes

The kernel holds one mention tile and the image's ENTIRE box axis in VMEM,
so grid activations, the head GEMM, the mask, and the softmax all fuse —
nothing but the [G,A,B] ranking distribution reaches HBM.  Box counts per
image are small (Flickr30k ≤ ~30, bucketed ≤ 32–128), so the full-B block
easily fits.

XLA oracle: :func:`affinity_rank_reference` (= grid_head_reference +
icl.models.affinity.rank_boxes); equality tested in interpret mode and on
real TPU (tests/tpu/).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from icl.ops.grid_head import _round_up, grid_head_reference


def affinity_rank_reference(X, Y, b1, W2, b2, box_valid,
                            affinity_col: int = 1):
    """[G,A,K],[G,B,K],[G,B] → [G,A,B] masked per-image ranking softmax.

    Composes the model's own rank_boxes so the masking convention has ONE
    source (it used to be duplicated here and could silently diverge)."""
    from icl.models.affinity import rank_boxes

    return rank_boxes(grid_head_reference(X, Y, b1, W2, b2), box_valid,
                      affinity_col=affinity_col)


def _rank_kernel(x_ref, y_ref, b1_ref, w2_ref, b2_ref, valid_ref, out_ref):
    # x [1,Ta,K] y [1,B,K] b1 [K] w2 [K,1] b2 [1] valid [1,1,B] out [1,Ta,B]
    x = x_ref[0]
    y = y_ref[0]
    Ta, K = x.shape
    B = y.shape[0]
    h = jnp.maximum(x[:, None, :] + y[None, :, :] + b1_ref[:], 0.0)
    s = jnp.dot(h.reshape(Ta * B, K), w2_ref[:],
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    s = (s + b2_ref[:]).reshape(Ta, B)
    valid = valid_ref[0, 0]                                # [B] bool as int32
    neg = jnp.finfo(jnp.float32).min
    s = jnp.where(valid[None, :] != 0, s, neg)
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m) * (valid[None, :] != 0)
    denom = jnp.sum(e, axis=1, keepdims=True)
    out_ref[0] = e / jnp.maximum(denom, 1e-30)


@functools.partial(jax.jit, static_argnames=("block_a", "affinity_col"))
def affinity_rank_pallas(X, Y, b1, W2, b2, box_valid,
                         block_a: int = 64, affinity_col: int = 1):
    """Pallas TPU kernel; same contract as :func:`affinity_rank_reference`."""
    G, A, K = X.shape
    B = Y.shape[1]
    Bp = _round_up(B, 8)
    # VMEM-aware mention tile: the in-kernel [Ta,Bp,K] f32 activation is
    # the dominant buffer — cap it at ~4 MB (grid_head_pallas discipline);
    # with the default box buckets (<=32) this leaves Ta = block_a, but a
    # 64/128-box bucket at K=1024 would otherwise blow the ~16 MB core
    Ta = min(block_a, _round_up(A, 8),
             max(8, (4 * 2**20 // (Bp * K * 4)) // 8 * 8))
    Ap = _round_up(A, Ta)
    Xp = jnp.pad(X, ((0, 0), (0, Ap - A), (0, 0)))
    Yp = jnp.pad(Y, ((0, 0), (0, Bp - B), (0, 0)))
    # [G, 1, Bp]: a (1, 1, Bp) block satisfies the sublane rule (dim == 1
    # equals the array dim), which a (1, Bp) block of a [G, Bp] array doesn't
    vp = jnp.pad(box_valid.astype(jnp.int32),
                 ((0, 0), (0, Bp - B)))[:, None, :]
    w2_col = W2[:, affinity_col:affinity_col + 1]
    b2_col = b2[affinity_col:affinity_col + 1]

    out = pl.pallas_call(
        _rank_kernel,
        out_shape=jax.ShapeDtypeStruct((G, Ap, Bp), jnp.float32),
        grid=(G, Ap // Ta),
        in_specs=[
            pl.BlockSpec((1, Ta, K), lambda g, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Bp, K), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda g, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K, 1), lambda g, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1,), lambda g, i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, Bp), lambda g, i: (g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, Ta, Bp), lambda g, i: (g, i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * G * Ap * Bp * K,
            bytes_accessed=4 * (G * Ap * K + G * Bp * K + G * Ap * Bp),
            transcendentals=G * Ap * Bp,
        ),
    )(Xp, Yp, b1, w2_col, b2_col, vp)
    return out[:, :A, :B]


def rank_boxes_fused(X, Y, b1, W2, b2, box_valid,
                     use_pallas: bool | None = None, affinity_col: int = 1):
    if use_pallas is None:
        use_pallas = jax.devices()[0].platform == "tpu"
    if use_pallas:
        return affinity_rank_pallas(X, Y, b1, W2, b2, box_valid,
                                    affinity_col=affinity_col)
    return affinity_rank_reference(X, Y, b1, W2, b2, box_valid,
                                   affinity_col=affinity_col)
