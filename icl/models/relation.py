"""Pairwise mention-relation classifier (component C7).

Reference parity: SURVEY.md §6.4 / BASELINE.json config[1] — 4-way
``{null=0, coref=1, subset_ij=2, subset_ji=3}`` classifier over mention
pairs with a shared BiLSTM caption encoder (hidden 200/direction over
word2vec-300), mention rep = [fwd;bwd] states at the mention's first and
last token (R^800), pair vector = [m_i; m_j] (R^1600), head
Dense(800, relu) → Dropout(0.5) → Dense(4), class-weighted CE.

TPU-native design (SURVEY §4.1): the reference re-encoded captions for every
one of the O(M²) pairs in Python loops.  Here each caption in the image batch
is encoded **once**; mention and pair tensors are formed by flat gathers
(single-index ``jnp.take`` into ``[I·C·L, 2H]``) with no ``[I,M,L,·]``
intermediate.  Kernel K1 was *reinterpreted* (ARCHITECTURE.md §3.2): the
distributed-head algebra below makes an explicit pair tensor unnecessary,
so K1 became the fused M×M grid head in ``icl.ops.grid_head``; the gather
path here is its permanent XLA correctness oracle.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from icl.data.pairs import RELATION_CLASSES
from icl.models.rnn import BiLSTM

__all__ = ["RelationModel", "RELATION_CLASSES"]


def _extract_pairs(grid: jnp.ndarray, pair_ij: jnp.ndarray) -> jnp.ndarray:
    """[I,M,M,O] pair-grid logits + [I,P,2] indices → [I,P,O] pair logits.

    A one-hot MXU contraction instead of a gather: the 3-index gather of
    O=4-wide rows runs at 4/128-lane utilization and traced 99 µs/call at
    bench shapes (I=128, M=16) — 5.7% of the whole predict step — while
    ``Σ_m onehot[p,m]·grid[m]`` is an [I,P,M²]×[I,M²,O] batched GEMM XLA
    fuses the one-hot generation into (nothing materializes in HBM):
    measured 12.4 µs, 8× faster, r3 ledger.

    Precision is pinned to 'highest' REGARDLESS of the session matmul
    policy: an f32 splits exactly into the 3-pass bf16 chunks and the
    one-hot factors 0.0/1.0 are exact in bf16, so every product and the
    single nonzero accumulation are exact — the contraction reproduces the
    gather BITWISE (measured max|d| = 0.0; under 'high' it drifts ~1e-5,
    at the parity gate).  Semantics match the gather for every in-range
    index incl. duplicated padded pairs; the one caveat is a non-finite
    grid cell, whose 0·inf products poison all P rows of that image
    instead of one pair (diverged-checkpoint territory — train metrics
    surface non-finite losses long before predict).
    """
    I, M, _, O = grid.shape
    flat_idx = pair_ij[:, :, 0] * M + pair_ij[:, :, 1]            # [I,P]
    onehot = (flat_idx[:, :, None]
              == jnp.arange(M * M, dtype=jnp.int32)).astype(grid.dtype)
    return jnp.einsum("ipm,imo->ipo", onehot, grid.reshape(I, M * M, O),
                      precision="highest")


def gather_mention_reps(enc: jnp.ndarray, m_cap: jnp.ndarray,
                        m_first: jnp.ndarray, m_last: jnp.ndarray) -> jnp.ndarray:
    """[I,C,L,2H] encoded captions + [I,M] span tables → [I,M,4H] mention reps.

    rep = [enc[cap, first] ; enc[cap, last]] — fwd/bwd states at the span
    boundaries (SURVEY §6.4).  Implemented as two flat gathers.
    """
    I, C, L, twoH = enc.shape
    flat = enc.reshape(I * C * L, twoH)
    img_off = (jnp.arange(I, dtype=jnp.int32) * C)[:, None]     # [I,1]
    row = (img_off + m_cap) * L                                  # [I,M]
    first_rep = jnp.take(flat, row + m_first, axis=0)            # [I,M,2H]
    last_rep = jnp.take(flat, row + m_last, axis=0)
    return jnp.concatenate([first_rep, last_rep], axis=-1)


def gather_mention_reps_scan(hs: jnp.ndarray, C: int, m_cap: jnp.ndarray,
                             m_first: jnp.ndarray,
                             m_last: jnp.ndarray) -> jnp.ndarray:
    """Scan-form twin of :func:`gather_mention_reps` — negative result #5.

    hs is the BiLSTM recurrence ys buffer [L, 2, I·C, H] (``scan_form=True``):
    fwd state at position p lives at ``hs[p, 0]``, bwd state at position p at
    ``hs[L-1-p, 1]`` (the backward direction scans the time-reversed copy).
    Gathers the same four H-slices in the same pinned concat order
    ``[fwd@first; bwd@first; fwd@last; bwd@last]`` as the [I,C,L,2H] path
    (bit-identical, see tests/unit/test_rnn_scan_form.py), so the [B,L,2H]
    transpose/reverse/concat materialization never exists.  Kept as a
    DOCUMENTED NEGATIVE RESULT, not wired into RelationModel: on the v5e
    bench shapes this traced 2.21 ms/step (and a [L,B,2H] concat-reverse
    middle ground 2.22) vs 2.15 for the materializing path — the backward
    scan absorbs the 4-way cotangent scatter-add and loses more than the
    relayout copies cost (see the note in RelationModel.__call__).
    """
    L, G, B, H = hs.shape
    I = B // C
    flat = hs.reshape(L * G * B, H)
    img_off = (jnp.arange(I, dtype=jnp.int32) * C)[:, None]      # [I,1]
    row = img_off + m_cap                                        # [I,M]
    bwd_first = (L - 1 - m_first) * (G * B) + B + row
    bwd_last = (L - 1 - m_last) * (G * B) + B + row
    return jnp.concatenate([
        jnp.take(flat, m_first * (G * B) + row, axis=0),         # fwd@first
        jnp.take(flat, bwd_first, axis=0),                       # bwd@first
        jnp.take(flat, m_last * (G * B) + row, axis=0),          # fwd@last
        jnp.take(flat, bwd_last, axis=0),                        # bwd@last
    ], axis=-1)                                                  # [I,M,4H]


class RelationModel(nn.Module):
    """Image-batch relation model; returns logits [I, P, 4].

    The head is computed in the *distributed* form: with the §6.4 pair
    vector [m_i; m_j] and head kernel W = [W_top; W_bot],

        relu([m_i; m_j] @ W + b) == relu(m_i @ W_top + m_j @ W_bot + b)

    so each mention is projected ONCE ([I,M,4H]@[4H,hidden] — M GEMM rows)
    instead of once per pair (P ≈ M²/2 rows): ~M/2× fewer head FLOPs.  The
    parameter tree is identical to the concat formulation (head_dense/
    {kernel,bias}) and the Keras oracle runs the concat form — the parity
    test proves the algebraic restructuring.

    ``fused=True`` computes the full M×M logit grid with the Pallas
    grid-head kernels (K1) and gathers pair cells: icl.ops.grid_head at
    predict, icl.ops.grid_head_train (custom VJP, in-kernel Mosaic-PRNG
    dropout, on-chip recompute backward) in training — the [·,·,hidden]
    activation and its dropout mask never reach HBM in either direction.
    Training seeds are per-image (derived from the step's dropout rng), so
    data-parallel sharding reproduces single-device masks.  The gather form
    below remains the permanent XLA oracle and the off-TPU training path
    (the Mosaic PRNG has no interpret-mode lowering).
    """

    lstm_hidden: int = 200
    head_hidden: int = 800
    dropout: float = 0.5
    num_classes: int = 4
    compute_dtype: jnp.dtype = jnp.float32
    fused: bool = False
    lstm_unroll: int = 1

    @nn.compact
    def __call__(self, emb_table: jnp.ndarray, batch: dict,
                 deterministic: bool = True, loss_grid: tuple | None = None):
        from icl.models._dense import DenseParams
        from icl.ops.grid_head import fused_grid_head
        from icl.ops.grid_head_train import grid_ce_sums

        tokens = batch["tokens"]          # [I, C, L]
        tok_len = batch["tok_len"]        # [I, C]
        I, C, L = tokens.shape
        x = jnp.take(emb_table, tokens.reshape(I * C, L), axis=0)  # [I*C, L, D]
        # NOTE: the BiLSTM deliberately stays on the XLA scan path even when
        # fused=True — measured on v5e, the batched scan is ~56 TFLOPS f32
        # (near compute-bound) while the tiled Pallas recurrence
        # (icl.ops.lstm_kernel) is 1.7x slower: VMEM limits batch tiles to
        # 32 rows (quarter-MXU GEMMs) and grid programs serialize.
        # Negative result #5 (r3): consuming the recurrence ys buffer in
        # scan form (BiLSTM(scan_form=True) + gather_mention_reps_scan, or
        # a [L,B,2H] concat-reverse intermediate) to kill the r2-flagged
        # scan-buffer relayout copies traced 2.21 / 2.22 ms/step vs this
        # path's 2.15 ms on the bench shapes: the backward scan absorbs the
        # mention-cotangent scatters and grows more than the transposes
        # cost.  XLA's layout for the [B,L,2H] materialization is already
        # near-optimal from the outside.
        enc_flat, _ = BiLSTM(self.lstm_hidden, compute_dtype=self.compute_dtype,
                             unroll=self.lstm_unroll,
                             name="caption_bilstm")(x, tok_len.reshape(I * C))
        enc = enc_flat.reshape(I, C, L, 2 * self.lstm_hidden)
        mreps = gather_mention_reps(enc, batch["m_cap"], batch["m_first"],
                                    batch["m_last"])              # [I,M,R]
        R = mreps.shape[-1]
        W1, b1 = DenseParams(2 * R, self.head_hidden, name="head_dense")()
        W2, b2 = DenseParams(self.head_hidden, self.num_classes,
                             name="head_out")()
        proj_i = mreps @ W1[:R]                                   # [I,M,K]
        proj_j = mreps @ W1[R:]
        pair_ij = batch["pair_ij"]

        if self.fused:
            if deterministic:
                # bf16 throughput mode: one-pass bf16 kernel dot (the same
                # policy the train kernel follows at 'default' precision);
                # f32 mode keeps the pinned-'highest' parity-grade dot
                grid = fused_grid_head(
                    proj_i, proj_j, b1, W2, b2,
                    fast_dot=self.compute_dtype == jnp.bfloat16)
                if loss_grid is not None:
                    labels, weights = loss_grid
                    return grid_ce_sums(grid, labels,
                                        jax.lax.stop_gradient(weights))
            else:
                from icl.ops.grid_head_train import (grid_head_train,
                                                     grid_head_train_loss)
                seeds = jax.random.randint(
                    self.make_rng("dropout"), (I,), 0,
                    jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
                # backward dots follow the session precision policy: exact
                # under 'highest' (parity/tests), one-pass bf16 otherwise
                exact = jax.config.jax_default_matmul_precision == "highest"
                if loss_grid is not None:
                    # training-loss mode: CE fused into the kernel — only
                    # (Σ ce·w, Σ hits, Σ valid) scalars leave VMEM
                    labels, weights = loss_grid
                    return grid_head_train_loss(
                        proj_i, proj_j, b1, W2, b2, seeds, labels,
                        jax.lax.stop_gradient(weights),
                        float(self.dropout), exact)
                grid = grid_head_train(proj_i, proj_j, b1, W2, b2,
                                       seeds, float(self.dropout), exact)
            return _extract_pairs(grid, pair_ij)                  # [I,P,O]

        if loss_grid is not None:
            # XLA oracle for the in-kernel grid loss (materializes the
            # [I,M,M,hidden] activation — test/CPU scales only)
            h = nn.relu(proj_i[:, :, None, :] + proj_j[:, None, :, :] + b1)
            h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
            labels, weights = loss_grid
            return grid_ce_sums(h @ W2 + b2, labels,
                                jax.lax.stop_gradient(weights))

        M = mreps.shape[1]
        flat_i = proj_i.reshape(I * M, -1)
        flat_j = proj_j.reshape(I * M, -1)
        img_off = (jnp.arange(I, dtype=jnp.int32) * M)[:, None]
        h = (jnp.take(flat_i, img_off + pair_ij[:, :, 0], axis=0)
             + jnp.take(flat_j, img_off + pair_ij[:, :, 1], axis=0) + b1)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h @ W2 + b2
